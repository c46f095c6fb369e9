"""Online serving CLI: JSONL requests in, answers (+ passage rankings) out.

Capability beyond the reference (which only ships offline ``--mode test``
over pre-pickled tensors — CaSE/Run.py:35-62): requests are tokenized and
featurized on the host with the SAME code path as the offline pipeline
(data/featurize.py, so serving and evaluation are guaranteed to agree) and
the chip is driven with pipelined batch dispatch — all batches submitted
before results are fetched in order, overlapping the host roundtrip with
device compute (docs/PERF.md: ~18% throughput on the relay-backed chip).

Request format (one JSON object per line):

    {"id": "r1", "query": "current question",
     "history": ["previous turn", ...],           # optional
     "passages": ["candidate passage text", ...]} # the retrieval pool

Response line (order preserved):

    {"id": "r1", "answer": "...", "ranking": [2, 0, 1, ...]}   # best-first
                                                                # indices
    (``ranking`` only for models with a rank head: case/masque/tmemnet)

Usage:
    python -m case_rg_tpu.cli.serve --model case \\
        --prepared_dir ./dataset/cast/prepared --output_path ./output/case \\
        --input requests.jsonl --output answers.jsonl \\
        [--epoch N] [--bf16] [--batch_size 64] [--beam_width K]

``--input -`` reads stdin and streams each completed batch to ``--output``
(or stdout) as soon as it is fetched — a minimal line-oriented server.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data.batching import Batcher
from ..data.featurize import featurize
from ..data.text import split_sentences
from ..data.vocab import Vocabulary
from ..models import build_model_cfg, create_model
from ..runtime.inference import make_predict_fn
from ..runtime.io import ids_to_sentence, remove_duplicate
from ..train.checkpoint import checkpoint_exists, latest_epoch, load_checkpoint


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True,
                   choices=["case", "masque", "glks", "tmemnet", "gttp",
                            "s2sa"])
    p.add_argument("--prepared_dir", type=str, required=True,
                   help="prepared dir holding vocab.txt (+ freq.json)")
    p.add_argument("--output_path", type=str, required=True,
                   help="training output dir holding model/ checkpoints")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch (default: latest)")
    p.add_argument("--input", type=str, default="-")
    p.add_argument("--output", type=str, default="-")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--embedding_size", type=int, default=256)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--max_target_length", type=int, default=40)
    p.add_argument("--beam_width", type=int, default=1)
    p.add_argument("--early_exit", action="store_true")
    p.add_argument("--fast_argmax", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 parameters (metric-identical serving "
                        "config — docs/PERF.md)")
    p.add_argument("--query_len", type=int, default=60)
    p.add_argument("--passage_len", type=int, default=100)
    p.add_argument("--num_passage", type=int, default=10)
    p.add_argument("--min_window_size", type=int, default=4)
    p.add_argument("--num_windows", type=int, default=1)
    p.add_argument("--ema", action="store_true", help="serve EMA weights")
    return p


def featurize_requests(requests: List[dict], model: str, vocab: Vocabulary,
                       dcfg: DataConfig) -> Dict[str, np.ndarray]:
    """Requests -> the same fixed-shape arrays the offline pipeline emits
    (tokenization mirrors data/loaders.load_query/load_passage)."""
    tok = vocab.tokenizer()
    query: Dict[str, List[str]] = {}
    passage: Dict[str, List[str]] = {}
    samples = []
    for i, req in enumerate(requests):
        qid = f"q{i}"
        query[qid] = tok(req.get("query", ""))
        ctx_ids = []
        for j, h in enumerate(req.get("history", [])):
            cid = f"q{i}_h{j}"
            query[cid] = tok(h)
            ctx_ids.append(cid)
        pool = []
        for j, ptext in enumerate(req.get("passages", [])):
            pid = f"p{i}_{j}"
            joined = " [SEP] ".join(
                " ".join(tok(sent)) for sent in split_sentences(ptext))
            passage[pid] = joined.split(" ") if joined else []
            pool.append(pid)
        samples.append({"query_id": qid, "context_id": ctx_ids,
                        "passage_pool_id": pool, "passage_id": [],
                        "answer": []})
    arrays = featurize(model, samples, query, passage, vocab, None, dcfg)
    return arrays


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    cache_dir = os.environ.get("CASE_RG_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/case_rg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    vocab = Vocabulary.load(os.path.join(args.prepared_dir, "vocab.txt"))
    dcfg = DataConfig(query_len=args.query_len, passage_len=args.passage_len,
                      num_passage=args.num_passage,
                      answer_len=args.max_target_length,
                      min_window_size=args.min_window_size,
                      num_windows=args.num_windows)
    base = ModelConfig(embedding_size=args.embedding_size,
                       hidden_size=args.hidden_size, num_heads=args.num_heads,
                       max_target_length=args.max_target_length,
                       max_dec_len=args.max_target_length,
                       beam_width=args.beam_width,
                       min_window_size=args.min_window_size,
                       num_windows=args.num_windows)
    mcfg = build_model_cfg(base, args.model, vocab)
    model = create_model(args.model, mcfg)

    epoch = args.epoch if args.epoch is not None else \
        latest_epoch(args.output_path)
    if epoch is None or not checkpoint_exists(args.output_path, epoch):
        raise SystemExit(f"no checkpoint for epoch {epoch!r} under "
                         f"{args.output_path}/model")

    # read all requests up front for file input; stream batches for stdin
    src = sys.stdin if args.input == "-" else open(args.input,
                                                  encoding="utf-8")
    sink = sys.stdout if args.output == "-" else open(args.output, "w",
                                                      encoding="utf-8")
    requests = [json.loads(line) for line in src if line.strip()]
    if src is not sys.stdin:
        src.close()
    if not requests:
        print("[serve] no requests", file=sys.stderr)
        return

    arrays = featurize_requests(requests, args.model, vocab, dcfg)

    # init a state template from one batch, then load the checkpoint
    from ..train.trainer import Trainer
    trainer = Trainer(model, TrainConfig(batch_size=args.batch_size,
                                         output_path=args.output_path),
                      total_steps=100)
    batcher = Batcher(arrays, min(args.batch_size, len(requests)),
                      shuffle=False)
    sample = next(Batcher(arrays, min(args.batch_size, len(requests)),
                          shuffle=False).epoch(0))
    sample = {k: v for k, v in sample.items() if not k.startswith("_")}
    template = jax.device_get(trainer.init_state(jax.random.PRNGKey(0),
                                                 sample))
    state = load_checkpoint(args.output_path, epoch, template)
    params = state.ema if args.ema else state.params
    if args.bf16:
        from ..train.precision import cast_params
        params = cast_params(params)

    predict_fn = make_predict_fn(model, mcfg, args.max_target_length,
                                 args.beam_width, early_exit=args.early_exit,
                                 fast_argmax=args.fast_argmax)

    # pipelined dispatch: submit every batch, then fetch in order
    host_batches, outs = [], []
    for batch in batcher.epoch(0):
        dev = {k: v for k, v in batch.items() if not k.startswith("_")}
        outs.append(predict_fn({"params": params}, dev))
        host_batches.append(batch)

    served = 0
    for batch, out in zip(host_batches, outs):
        out = jax.device_get(out)
        sents = None
        if "answer" in out:
            sents = [ids_to_sentence(row, vocab)
                     for row in np.asarray(out["answer"])]
            remove_duplicate(sents)
        detok = vocab.detokenizer()
        w = batch["sample_weight"]
        for i in range(len(batch["id"])):
            if w[i] == 0 or served >= len(requests):
                continue  # padded duplicate row
            req = requests[int(batch["id"][i])]
            resp = {"id": req.get("id", int(batch["id"][i]))}
            if sents is not None:
                resp["answer"] = detok(sents[i])
            if "rank" in out:
                scores = np.asarray(out["rank"][i])
                n_real = len(req.get("passages", []))
                order = np.argsort(-scores[:max(n_real, 1)], kind="stable")
                resp["ranking"] = [int(j) for j in order[:n_real]]
            sink.write(json.dumps(resp) + "\n")
            served += 1
        sink.flush()
    if sink is not sys.stdout:
        sink.close()
    print(f"[serve] {served} requests answered (epoch {epoch}, "
          f"{'bf16' if args.bf16 else 'f32'})", file=sys.stderr)


if __name__ == "__main__":
    main()

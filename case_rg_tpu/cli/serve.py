"""Online serving CLI: JSONL requests in, answers (+ passage rankings) out.

Capability beyond the reference (which only ships offline ``--mode test``
over pre-pickled tensors — CaSE/Run.py:35-62): requests are tokenized and
featurized on the host with the SAME code path as the offline pipeline
(data/featurize.py, so serving and evaluation are guaranteed to agree) and
the chip is driven with pipelined batch dispatch — all batches submitted
before results are fetched in order, overlapping the host roundtrip with
device compute (docs/PERF.md: ~18% throughput on the relay-backed chip).

This module is the CLI entry point (argument surface, checkpoint/export
loading, serving-mesh setup, warmup); the serving machinery lives in
``case_rg_tpu/serving/`` (featurize, lanes, http, offline).

Request format (one JSON object per line):

    {"id": "r1", "query": "current question",
     "history": ["previous turn", ...],           # optional
     "passages": ["candidate passage text", ...], # the retrieval pool
     "max_tokens": 20,                            # optional per-request
                                                  # response-length cap
     "seed": 7,                                   # optional (--continuous
                                                  # --decoding sample):
                                                  # per-request PRNG seed
     "temperature": 0.7, "top_k": 40, "top_p": 0.9,  # optional per-request
                                                  # sampling controls
                                                  # (--request_controls)
     "stream": true}                              # optional (--listen
                                                  # --continuous): stream
                                                  # token deltas as JSONL
                                                  # lines while the row
                                                  # decodes; final line
                                                  # carries answer/ranking
                                                  # + "done": true

Response line (order preserved):

    {"id": "r1", "answer": "...", "ranking": [2, 0, 1, ...]}   # best-first
                                                                # indices
    (``ranking`` only for models with a rank head: case/masque/tmemnet)

Usage:
    python -m case_rg_tpu.cli.serve --model case \\
        --prepared_dir ./dataset/cast/prepared --output_path ./output/case \\
        --input requests.jsonl --output answers.jsonl \\
        [--epoch N] [--bf16] [--batch_size 64] [--beam_width K]

``--input -`` reads stdin; requests are consumed in batch_size chunks as
they arrive and each chunk's responses are flushed as soon as they are
fetched (up to ``--pipeline_depth`` chunks in flight), so a long-lived
client piping requests receives rolling responses — a minimal
line-oriented server.

``--pool_buckets 2,5,10`` routes each request to the smallest static pool
size >= its passage count instead of padding every pool to ``num_passage``.
The decode cross-attention memory is ``query_len + num_passage*passage_len``
tokens and bandwidth-bound (docs/PERF.md), so a request with 3 passages
served in the 5-bucket streams roughly half the K/V bytes of the 10-pool.
Each bucket is its own XLA compilation (cached persistently). Semantics:
the bucketed pool contains no ``[CLS][SEP]`` dummy rows for absent
passages, i.e. the model scores exactly the provided pool — answers can
differ slightly from padded-pool serving (the dummy rows the offline
pipeline pads with participate in the passage-selection prior). Output
order is preserved via a reorder buffer; a part-filled bucket dispatches
when full, when ``--bucket_flush_after`` newer requests have streamed past
its oldest entry (bounded latency for stdin pipes), or at end of input.
``--num_passage`` always joins as the largest bucket, so pools bigger than
every listed bucket are scored at the full pool size. With ``--continuous``
each bucket becomes its own continuous-decode lane (runtime/continuous.py
``run_continuous_multi``): small-pool requests decode against a compact
cross-attention memory AND refill mid-flight; per scheduler round every
lane's chunk is dispatched before any lane's results are fetched, so one
lane's host roundtrip overlaps the other lanes' device compute.

``--listen HOST:PORT`` turns the CLI into an HTTP micro-batching server
(zero dependencies — stdlib http.server; serving/http.py): POST JSONL
request lines to ``/``, receive JSONL responses; GET ``/healthz`` for
liveness and ``/varz`` for serving stats (requests, batches, occupancy,
batch latency, errors). Concurrent client requests are coalesced into
device batches (``--max_wait_ms`` window, ``--batch_size`` cap) with
pipelined dispatch, composing with ``--pool_buckets`` (each coalesced
batch runs at the smallest static pool size that fits its largest
request).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List

import numpy as np

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data.vocab import Vocabulary
from ..models import build_model_cfg, create_model
from ..runtime.inference import make_predict_fn
from ..runtime.io import ids_to_sentence, remove_duplicate
from ..serving.featurize import bucket_for, chunk_to_batch, parse_buckets, \
    read_chunks, read_requests
from ..serving.http import serve_http
from ..serving.offline import run_offline_batched, run_offline_continuous
from ..train.checkpoint import checkpoint_exists, latest_epoch, load_checkpoint

# Pre-split import compatibility (tests/tools import these from here; the
# canonical home is case_rg_tpu/serving/featurize.py)
_bucket_for = bucket_for
_chunk_to_batch = chunk_to_batch
_parse_buckets = parse_buckets
_read_chunks = read_chunks
_read_requests = read_requests


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default=None,
                   choices=["case", "masque", "glks", "tmemnet", "gttp",
                            "s2sa"],
                   help="required unless --from_export (the artifact "
                        "sidecar names the model)")
    p.add_argument("--prepared_dir", type=str, required=True,
                   help="prepared dir holding vocab.txt (+ freq.json)")
    p.add_argument("--output_path", type=str, default=None,
                   help="training output dir holding model/ checkpoints "
                        "(required unless --from_export)")
    p.add_argument("--from_export", type=str, default="",
                   help="serve a StableHLO artifact written by "
                        "cli/export_model.py instead of a checkpoint: no "
                        "model build, no checkpoint restore — params are "
                        "baked into the artifact. Model, batch size, data "
                        "shapes, decode length, and rank-only mode come "
                        "from the <artifact>.json sidecar; flags that "
                        "would change the compiled program (--continuous, "
                        "--pool_buckets, --decoding sample, --bf16, ...) "
                        "do not apply. The artifact is platform-tagged: "
                        "serve it on the platform it was exported for")
    p.add_argument("--epoch", type=str, default=None,
                   help="checkpoint epoch (default: latest); 'best' serves "
                        "the best-dev-loss epoch (model/best.json, written "
                        "by --dev_eval training); 'avg' serves the "
                        "averaged checkpoint (run --mode avg)")
    p.add_argument("--input", type=str, default="-")
    p.add_argument("--output", type=str, default="-")
    p.add_argument("--batch_size", type=int, default=None,
                   help="device batch width (default 64; 128 for "
                        "--rank_only — the no-decode program scales to "
                        "the B=128 knee, +53%% qps for CaSE: docs/PERF.md "
                        "round 12)")
    p.add_argument("--embedding_size", type=int, default=256)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--max_target_length", type=int, default=40)
    p.add_argument("--beam_width", type=int, default=1)
    p.add_argument("--early_exit", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="greedy decode stops once every row in the batch "
                        "has emitted EOS (sentence-identical to the fixed "
                        "40-step loop — opt-in for offline parity runs, ON "
                        "by default for serving; --no-early_exit disables)")
    from .flags import add_fast_argmax_flag
    add_fast_argmax_flag(p)
    p.add_argument("--rank_only", action="store_true",
                   help="return passage rankings only, skipping answer "
                        "generation (case/masque/tmemnet). The sequential "
                        "decode dominates full predict cost, so "
                        "ranking-only serving runs several times faster "
                        "(docs/PERF.md)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 parameters (metric-identical serving "
                        "config — docs/PERF.md)")
    p.add_argument("--bf16_scores", action="store_true",
                   help="with --bf16: keep attention scores in bf16 instead "
                        "of f32 (+16%% CaSE qps; generation unchanged, "
                        "ranking can flip near-ties — docs/PERF.md)")
    p.add_argument("--fused_attn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Pallas fused encoder attention for bf16 serving on "
                        "TPU (scores stay in VMEM; ~1-ULP bf16 rounding "
                        "differences vs the einsum path — docs/PERF.md "
                        "round 5; --no-fused_attn restores the einsum path)")
    p.add_argument("--query_len", type=int, default=60)
    p.add_argument("--passage_len", type=int, default=100)
    p.add_argument("--num_passage", type=int, default=10)
    p.add_argument("--min_window_size", type=int, default=4)
    p.add_argument("--num_windows", type=int, default=1)
    p.add_argument("--ema", action="store_true", help="serve EMA weights")
    p.add_argument("--decoding", type=str, default="greedy",
                   choices=["greedy", "sample"],
                   help="sampling-based serving (--decoding sample) with "
                        "the same controls as run --mode test. Composes "
                        "with --continuous: per-request PRNG keys ride in "
                        "the decode rows (seeded by --sample_seed + the "
                        "request's optional \"seed\" field), so sampled "
                        "answers are reproducible per request regardless "
                        "of batch composition or refill timing")
    p.add_argument("--sample_seed", type=int, default=123456)
    p.add_argument("--warmup", action="store_true",
                   help="compile every serving program before reading "
                        "input / binding --listen (one synthetic request "
                        "per pool bucket x batch width; first CaSE compile "
                        "is 200-500 s on TPU — readiness beats surprising "
                        "the first client; warm restarts hit the "
                        "persistent compilation cache)")
    p.add_argument("--request_controls", action="store_true",
                   help="--continuous --decoding sample: honor per-request "
                        "\"temperature\"/\"top_k\"/\"top_p\" fields — each "
                        "decode row applies its own request's controls "
                        "(decode/loops.sampling_controls_rows); rows "
                        "without a field use the global flags. All rows "
                        "then sample from the standard controlled "
                        "distribution (no double-softmax quirk)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--pipeline_depth", type=int, default=4,
                   help="max batches in flight before fetching results")
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching (greedy, all six models): rows "
                        "progress independently; finished rows are "
                        "refilled mid-flight with newly arrived requests, "
                        "so batch cost tracks the mean answer length "
                        "instead of the max (runtime/continuous.py). "
                        "Composes with --pool_buckets: one lane per bucket")
    p.add_argument("--chunk_steps", type=int, default=8,
                   help="--continuous: decode steps per chunk between "
                        "harvest/refill points")
    p.add_argument("--refill", type=int, default=0,
                   help="--continuous: refill bucket size (encode program "
                        "for newly arrived requests); 0 = batch_size/4")
    p.add_argument("--lookahead", action="store_true",
                   help="--continuous: keep one chunk dispatched ahead so "
                        "the harvest fetch overlaps the next chunk's "
                        "compute (hides the host roundtrip; refills land "
                        "one chunk later, state is double-buffered)")
    p.add_argument("--device_loop", type=int, default=0, metavar="K",
                   help="--continuous: device-resident loop — K chunks "
                        "per dispatch, in-jit harvest + refills from a "
                        "pre-staged on-device ring (runtime/continuous/"
                        "device_loop; beats the fixed path where the "
                        "per-chunk loop loses — docs/PERF.md round 11). "
                        "Composes with --lookahead (double-dispatch), "
                        "--pool_buckets (one device ring per bucket), "
                        "--decoding sample / --request_controls (controls "
                        "ride the decode rows), and streaming (deltas "
                        "arrive once per mega — K chunks per host "
                        "roundtrip is the observable granularity)")
    p.add_argument("--stage_rows", type=int, default=0,
                   help="--device_loop: on-device ring size in rows (0 = "
                        "auto: ~batch*K*chunk_steps/10)")
    p.add_argument("--fused_stack", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas decoder-stack decode step; default "
                        "auto (bf16 TPU, long-memory stacks — docs/PERF.md "
                        "round 10)")
    p.add_argument("--async_harvest", action="store_true",
                   help="--continuous: pipelined flag fetch (no blocking "
                        "roundtrip between chunks). With --lookahead: "
                        "dispatch-first order (relay-attached chips); "
                        "without: harvest-first (sub-ms RTT chips)")
    p.add_argument("--refill_min", type=int, default=1,
                   help="--continuous: coalesce refills — wait until this "
                        "many rows are free before a mid-flight refill "
                        "(each refill pays a fixed refill-width encode + a "
                        "host roundtrip, so eager 1-row refills waste "
                        "both; rows keep finishing either way)")
    p.add_argument("--pool_shard", type=int, default=1,
                   help="shard the passage-pool axis over this many local "
                        "devices (the 'model' mesh axis): per-passage tower "
                        "compute stays device-local with collectives only "
                        "at cross-passage joins. Must divide every served "
                        "pool size; remaining devices fill the data axis")
    p.add_argument("--pool_buckets", type=str, default="",
                   help="comma-separated static pool sizes (e.g. 2,5,10); "
                        "requests are routed to the smallest bucket that "
                        "fits their passage count (module docstring). "
                        "Empty = every pool padded to --num_passage")
    p.add_argument("--listen", type=str, default="",
                   help="HOST:PORT: serve over HTTP instead of files/stdin. "
                        "POST JSONL request lines to / and receive JSONL "
                        "responses; GET /healthz for liveness. Concurrent "
                        "requests are coalesced into device batches "
                        "(--max_wait_ms window, --batch_size cap) with "
                        "pipelined dispatch")
    p.add_argument("--max_wait_ms", type=float, default=20.0,
                   help="micro-batching window: how long the HTTP "
                        "dispatcher waits to fill a batch after the first "
                        "queued request")
    p.add_argument("--request_timeout", type=float, default=1800.0,
                   help="HTTP mode: seconds a request waits for its result "
                        "before a 503 (must cover the first request's "
                        "compile: 200-500 s per pool bucket on TPU)")
    p.add_argument("--bucket_flush_after", type=int, default=0,
                   help="offline --pool_buckets: dispatch a part-filled "
                        "bucket once this many newer requests have been "
                        "read since its oldest entry (bounds latency and "
                        "reorder-buffer growth for streaming stdin input; "
                        "0 = 2x batch_size)")
    p.add_argument("--batch_buckets", type=str, default="",
                   help="comma-separated static batch sizes (e.g. 8,64): "
                        "a part-filled chunk runs at the smallest batch "
                        "size that fits it instead of padding to "
                        "--batch_size — lower latency at low load; one "
                        "cached XLA program per size. Empty = always "
                        "--batch_size")
    return p


def resolve_batch_size(batch_size, rank_only):
    """Serving batch-size knee defaults (docs/PERF.md round 12): full
    predict peaks only +4-5% at B=128 for 2x per-request latency, so it
    stays at 64; rank-only has no sequential decode, gains +20-53% at
    B=128 and is flat beyond, so it defaults to 128. An explicit
    --batch_size (or the export sidecar's) always wins."""
    if batch_size is not None:
        return batch_size
    return 128 if rank_only else 64


def main(argv=None, _server_ready=None):
    """``_server_ready``: test hook — called with the HTTPServer instance
    (from the serving thread) once ``--listen`` is bound, so a test can
    issue requests and ``shutdown()`` it."""
    args = build_parser().parse_args(argv)
    import jax

    sidecar = None
    if args.from_export:
        # the artifact IS the compiled program: every flag that would
        # change it is rejected, and its sidecar supplies the model name,
        # batch size, data shapes, and decode config
        for bad, name in [
                (args.continuous, "--continuous"),
                (args.pool_buckets, "--pool_buckets"),
                (args.batch_buckets, "--batch_buckets"),
                (args.pool_shard > 1, "--pool_shard"),
                (args.decoding != "greedy", "--decoding sample"),
                (args.request_controls, "--request_controls"),
                (args.epoch is not None, "--epoch"),
                (args.ema, "--ema"), (args.bf16, "--bf16"),
                (args.bf16_scores, "--bf16_scores"),
                (args.rank_only, "--rank_only"),
                (args.model is not None, "--model"),
                (args.output_path is not None, "--output_path")]:
            if bad:
                raise SystemExit(f"--from_export serves the artifact as "
                                 f"exported; {name} does not apply (it is "
                                 f"fixed by — or irrelevant to — the "
                                 f"artifact)")
        try:
            with open(args.from_export + ".json", encoding="utf-8") as f:
                sidecar = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            raise SystemExit(f"--from_export: cannot read sidecar "
                             f"{args.from_export}.json: {e}")
        args.model = sidecar["model"]
        args.batch_size = int(sidecar["batch_size"])
        args.max_target_length = int(sidecar["max_target_length"])
        args.beam_width = int(sidecar.get("beam_width", 1))
        args.rank_only = bool(sidecar.get("rank_only"))
        d = sidecar["data"]
        args.query_len = int(d["query_len"])
        args.passage_len = int(d["passage_len"])
        args.num_passage = int(d["num_passage"])
    elif args.model is None or args.output_path is None:
        raise SystemExit("--model and --output_path are required (unless "
                         "--from_export)")

    args.batch_size = resolve_batch_size(args.batch_size, args.rank_only)

    if args.bf16_scores:
        from ..ops.attention import set_bf16_scores
        set_bf16_scores(True)
    if not args.fused_attn:
        from ..ops.attention import set_fused_attention
        set_fused_attention(False)
    from ..models.multimem import set_fused_stack
    set_fused_stack(args.fused_stack)

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
    bs = args.batch_size
    detok = vocab.detokenizer()
    params = None
    served = 0

    if args.from_export:
        # the artifact is the whole predict program with params baked in
        # (cli/export_model.py): nothing to build, nothing to restore —
        # jax + the blob serve. One fixed (batch_size x pool) shape.
        from ..runtime.exported import load_exported
        art = load_exported(args.from_export)
        plats = [p.lower() for p in sidecar.get("platforms", [])]
        backend = jax.default_backend().lower()
        if plats and backend not in plats:
            raise SystemExit(f"--from_export: artifact was exported for "
                             f"platform(s) {plats}, this host runs "
                             f"{backend!r} — re-export on the target "
                             f"platform")
        epoch = "export:" + str(sidecar.get("epoch"))
        bbuckets = [bs]

        def run_predict(batch):
            return art.call(batch)

        def ensure_params(batch):
            return
    else:
        base = ModelConfig(embedding_size=args.embedding_size,
                           hidden_size=args.hidden_size, num_heads=args.num_heads,
                           max_target_length=args.max_target_length,
                           max_dec_len=args.max_target_length,
                           beam_width=args.beam_width,
                           min_window_size=args.min_window_size,
                           num_windows=args.num_windows)
        mcfg = build_model_cfg(base, args.model, vocab)
        model = create_model(args.model, mcfg)

        if args.epoch is None:
            epoch = latest_epoch(args.output_path)
        elif args.epoch == "best":
            from ..train.checkpoint import best_epoch
            epoch = best_epoch(args.output_path)
            if epoch is None:
                raise SystemExit("--epoch best: no model/best.json under "
                                 f"{args.output_path} (train with --dev_eval)")
        elif args.epoch == "avg":
            epoch = "avg"   # averaged checkpoint (run --mode avg)
        else:
            try:
                epoch = int(args.epoch)
            except ValueError:
                raise SystemExit("--epoch must be an integer, 'best', or "
                                 f"'avg'; got {args.epoch!r}")
        if epoch is None or not checkpoint_exists(args.output_path, epoch):
            raise SystemExit(f"no checkpoint for epoch {epoch!r} under "
                             f"{args.output_path}/model")

        from ..train.trainer import Trainer
        trainer = Trainer(model, TrainConfig(batch_size=bs,
                                             output_path=args.output_path),
                          total_steps=100)
        try:
            predict_fn = make_predict_fn(model, mcfg, args.max_target_length,
                                         args.beam_width,
                                         early_exit=args.early_exit,
                                         fast_argmax=args.fast_argmax,
                                         decoding=args.decoding,
                                         sample_seed=args.sample_seed,
                                         temperature=args.temperature,
                                         top_k=args.top_k, top_p=args.top_p,
                                         rank_only=args.rank_only)
        except ValueError as e:   # --rank_only on a model without a rank head
            raise SystemExit(str(e))

        bbuckets = parse_buckets(args.batch_buckets, bs, "--batch_buckets") \
            if args.batch_buckets else [bs]
        if args.continuous:
            # the refill bucket is a second batch shape the mesh must divide
            args.refill = args.refill or max(bs // 4, 1)
            if not 1 <= args.refill <= bs:
                raise SystemExit(f"--refill must be in [1, batch_size]; got "
                                 f"{args.refill} (batch_size {bs})")
            if args.chunk_steps < 1:
                raise SystemExit(f"--chunk_steps must be >= 1; got "
                                 f"{args.chunk_steps}")
            if not 1 <= args.refill_min <= args.refill:
                raise SystemExit(f"--refill_min must be in [1, refill]; got "
                                 f"{args.refill_min} (refill {args.refill})")
            bbuckets = sorted(set(bbuckets + [args.refill]))

        # serving mesh: batches shard over the data axis of THIS process's
        # devices, params are replicated — the same dp layout trainer.predict
        # uses for offline --mode test, so a multi-chip host serves multi-chip
        # with no flag needed. The data-axis size divides every batch-bucket
        # size (gcd), and on a single chip this degrades to a plain device_put.
        # --pool_shard N additionally reserves N devices for the 'model' axis
        # and shards the passage-pool axis over them (per-passage tower compute
        # stays device-local; collectives only at the cross-passage joins).
        import math
        from functools import reduce
        from ..runtime.mesh import local_mesh, replicated, shard_batch
        pool_devices = max(1, args.pool_shard)
        if pool_devices > 1:
            pools = (parse_buckets(args.pool_buckets, dcfg.num_passage)
                     if args.pool_buckets else [dcfg.num_passage])
            bad = [k for k in pools if k % pool_devices]
            if bad:
                raise SystemExit(
                    f"--pool_shard {pool_devices} must divide every served pool "
                    f"size; offending: {bad} (pool buckets {pools})")
        mesh = local_mesh(reduce(math.gcd, bbuckets), model=pool_devices)

        def run_predict(batch):
            return predict_fn({"params": params},
                              shard_batch(mesh, batch,
                                          pool_axis=pool_devices > 1))

        def ensure_params(batch):
            nonlocal params
            if params is not None:
                return
            # first chunk: build the restore template WITHOUT computing —
            # eval_shape traces init_state abstractly (flax/orbax restore only
            # need the tree structure + shapes), skipping the full train-losses
            # init compile that used to dominate serving cold-start
            template = jax.eval_shape(
                lambda: trainer.init_state(jax.random.PRNGKey(0), batch))
            state = load_checkpoint(args.output_path, epoch, template)
            params = state.ema if args.ema else state.params
            if args.bf16:
                from ..train.precision import cast_params
                params = cast_params(params)
            # commit the tree to the device(s) ONCE (replicated over the
            # serving mesh): host-numpy params would be re-uploaded on every
            # predict call (~tens of MB through the relay per batch — measured
            # as a 30x serving slowdown by tools/exp_http_load.py before this
            # device_put)
            params = jax.device_put(params, replicated(mesh))

    def responses_for(chunk, out, dcfg_k, default_ids=None) -> List[dict]:
        nonlocal served
        out = jax.device_get(out)
        sents = None
        if "answer" in out:
            ids = np.asarray(out["answer"])
            # per-request max_tokens: truncate host-side (greedy/sampled
            # prefixes don't depend on later steps; the continuous path
            # already stopped the row at its cap)
            caps = [min(int(r["max_tokens"]), ids.shape[1])
                    if isinstance(r, dict) and "max_tokens" in r
                    else ids.shape[1] for r in chunk]
            sents = [ids_to_sentence(row[:max(c, 1)], vocab)
                     for row, c in zip(ids, caps)]
            remove_duplicate(sents)
        resps = []
        for i, req in enumerate(chunk):
            default = default_ids[i] if default_ids is not None else served + i
            resp = {"id": req.get("id", default)}
            if sents is not None:
                resp["answer"] = detok(sents[i])
            if "rank" in out:
                scores = np.asarray(out["rank"][i])
                n_real = min(len(req.get("passages", [])),
                             dcfg_k.num_passage)
                order = np.argsort(-scores[:max(n_real, 1)], kind="stable")
                resp["ranking"] = [int(j) for j in order[:n_real]]
            resps.append(resp)
        served += len(chunk)
        return resps

    if args.request_controls and not (args.continuous
                                      and args.decoding == "sample"):
        raise SystemExit("--request_controls applies to --continuous "
                         "--decoding sample serving only")

    cont = None
    if args.continuous:
        # continuous batching: per-row decode progress, finished rows
        # refilled mid-flight (runtime/continuous.py). Answers are
        # bit-identical per request to the batch predict path; throughput
        # tracks the MEAN answer length instead of the max.
        if args.batch_buckets or args.rank_only or args.beam_width > 1:
            raise SystemExit("--continuous composes with none of "
                             "--batch_buckets/--rank_only/--beam_width>1")
        if args.pool_buckets and args.lookahead and not args.device_loop:
            raise SystemExit("--lookahead applies to single-lane "
                             "--continuous only; with --pool_buckets the "
                             "multi-lane chunk driver already overlaps "
                             "each lane's harvest with the other lanes' "
                             "chunks (the device loop's multi-lane driver "
                             "DOES take --lookahead: per-lane "
                             "double-dispatch)")
        from ..runtime.continuous import make_continuous_fns, run_continuous
        init_fn, chunk_fn, refill_fn = make_continuous_fns(
            model, args.max_target_length, args.chunk_steps,
            fast_argmax=args.fast_argmax,
            donate_state=not args.lookahead,
            decoding=args.decoding, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p)

        # sampled continuous serving: each request gets its own PRNG key
        # (key data rides in the batch and then in the row's decode state),
        # derived from --sample_seed and the request's optional "seed"
        # field (fallback: an arrival counter) — so a request with a seed
        # samples the same answer regardless of batch composition, refill
        # timing, or which lane served it
        import itertools
        key_counter = itertools.count()

        def request_keys(chunk, width):
            ks = []
            for r in chunk:
                ent = r.get("seed") if isinstance(r, dict) else None
                ent = next(key_counter) if ent is None else int(ent)
                ks.append(np.random.SeedSequence(
                    [args.sample_seed, ent]).generate_state(2, np.uint32))
            ks += [ks[-1]] * (width - len(ks))   # pad rows never emit
            return np.stack(ks)

        def request_ctls(chunk, width):
            """Per-row (temperature, top_k, top_p), request fields
            overriding the global flags; validated here (same checks as
            the device pipeline — decode/loops.validate_controls) so a
            bad value fails only its own featurize chunk."""
            from ..decode.loops import validate_controls
            cs = []
            for r in chunk:
                t = float(r.get("temperature", args.temperature))
                k = int(r.get("top_k", args.top_k))
                tp = float(r.get("top_p", args.top_p))
                validate_controls(t, k, tp)
                cs.append((t, float(k), tp))
            cs += [cs[-1]] * (width - len(cs))
            return np.asarray(cs, np.float32)

        def cont_make_batch_for(dk):
            def mb(chunk, k):
                batch = chunk_to_batch(chunk, args.model, vocab, dk, k)
                if args.decoding == "sample":
                    batch["sample_key"] = request_keys(chunk, k)
                    if args.request_controls:
                        batch["sample_ctl"] = request_ctls(chunk, k)
                ensure_params(batch)
                return shard_batch(mesh, batch,
                                   pool_axis=pool_devices > 1)
            return mb

        def row_out(ids_row, rank_row):
            out = {"answer": ids_row[None]}
            if rank_row is not None:
                out["rank"] = rank_row[None]
            return out

        cont = {"make_batch": cont_make_batch_for(dcfg),
                "init": lambda _, bt: init_fn({"params": params}, bt),
                "chunk": lambda _, st: chunk_fn({"params": params}, st),
                "refill": refill_fn, "refill_size": args.refill,
                "run": run_continuous, "row_out": row_out,
                "lookahead": args.lookahead,
                "refill_min": args.refill_min,
                "async_harvest": args.async_harvest}
        if args.device_loop:
            from ..runtime.continuous.device_loop import \
                make_device_loop_fns
            stage = args.stage_rows or max(
                args.refill, args.batch_size * args.device_loop
                * args.chunk_steps // 10)
            dfns = make_device_loop_fns(
                model, args.max_target_length, args.chunk_steps,
                n_chunks=args.device_loop, stage_rows=stage,
                refill_bound=args.refill, fast_argmax=args.fast_argmax,
                decoding=args.decoding, temperature=args.temperature,
                top_k=args.top_k, top_p=args.top_p)
            # params restore is lazy (ensure_params runs inside
            # make_batch, which the driver always calls before the first
            # encode) — bind them at call time, like the chunk-loop
            # lambdas above, not at cont-build time
            _init, _mega = dfns.init_fn, dfns.mega_fn
            dfns.init_fn = lambda _vs, batch: _init({"params": params},
                                                    batch)
            dfns.mega_fn = lambda _vs, wrap, stg, wr: _mega(
                {"params": params}, wrap, stg, wr)
            cont["device_fns"] = dfns
            cont["variables"] = None
        if args.pool_buckets:
            # multi-lane continuous serving: one lane (own decode state +
            # cached XLA programs) per static pool size; requests route to
            # the smallest bucket that fits and still refill mid-flight.
            # The jitted fns are shared — jit caches one executable per
            # state shape, i.e. per bucket.
            import dataclasses
            cbuckets = parse_buckets(args.pool_buckets, dcfg.num_passage)
            cont["buckets"] = cbuckets
            cont["make_batch_for"] = {
                k: cont_make_batch_for(
                    dataclasses.replace(dcfg, num_passage=k))
                for k in cbuckets}

    if args.warmup:
        # compile every serving program BEFORE accepting traffic (first
        # CaSE compile is 200-500 s on TPU — readiness beats surprising
        # the first client). Exercises the exact serving paths with a
        # synthetic request per (pool bucket x batch width); the
        # persistent compilation cache makes warm restarts cheap.
        import time as _time
        t0 = _time.time()

        def warm_req(k):
            # explicit seed: keep the sampled-serving arrival-counter key
            # stream identical with and without --warmup
            return {"query": "warm up", "passages": ["warm up ."] * k,
                    "seed": 0}

        pools = cont["buckets"] if cont is not None and "buckets" in cont \
            else (parse_buckets(args.pool_buckets, dcfg.num_passage)
                  if args.pool_buckets else [dcfg.num_passage])
        if cont is not None:
            import numpy as _np

            mbs = cont["make_batch_for"] if "buckets" in cont else \
                {pools[0]: cont["make_batch"]}
            dfns = cont.get("device_fns")
            for k, mb in mbs.items():
                for width in {bs, args.refill}:
                    if dfns is not None:
                        # device-loop serving: compile ITS programs (init
                        # at both widths; wrap/stage/push/mega at batch
                        # width) — the chunk-loop programs never run
                        st, _ = dfns.init_fn(None, mb([warm_req(k)],
                                                      width))
                        if width != bs:
                            continue
                        uid = _np.arange(bs, dtype=_np.int64)
                        wrap = dfns.wrap_fn(st, uid, uid >= 0)
                        from ..runtime.continuous.device_loop import \
                            _empty_stage
                        stg = _empty_stage(dfns, wrap)
                        _, hv = dfns.mega_fn(None, wrap, stg,
                                             _np.int32(0))
                        jax.block_until_ready(hv["count"])
                        continue
                    st, _ = cont["init"](None, mb([warm_req(k)], width))
                    if width == bs:
                        jax.block_until_ready(
                            jax.tree_util.tree_leaves(
                                cont["chunk"](None, st))[0])
        else:
            import dataclasses as _dc
            for k in pools:
                dk = _dc.replace(dcfg, num_passage=k)
                for width in bbuckets:
                    batch = chunk_to_batch([warm_req(k)], args.model,
                                           vocab, dk, width)
                    ensure_params(batch)
                    jax.block_until_ready(
                        jax.tree_util.tree_leaves(run_predict(batch))[0])
        kind = "continuous" if cont is not None else "predict"
        print(f"[serve] warmup compiled {kind} programs (pools {pools}) "
              f"in {_time.time()-t0:.0f}s", file=sys.stderr)

    if args.listen:
        serve_http(args, dcfg, ensure_params, responses_for, run_predict,
                   vocab, bbuckets, _server_ready, cont=cont)
        return

    src = sys.stdin if args.input == "-" else open(args.input,
                                                  encoding="utf-8")
    sink = sys.stdout if args.output == "-" else open(args.output, "w",
                                                      encoding="utf-8")

    if cont is not None:
        stats = run_offline_continuous(src, sink, args, dcfg, cont,
                                       responses_for)
        if src is not sys.stdin:
            src.close()
        if sink is not sys.stdout:
            sink.close()
        if served == 0:
            print("[serve] no requests", file=sys.stderr)
            return
        print(f"[serve] {served} requests answered continuously "
              f"({stats['chunks']} chunks, {stats['refills']} refills, "
              f"epoch {epoch}, {'bf16' if args.bf16 else 'f32'})",
              file=sys.stderr)
        return

    run_offline_batched(src, sink, args, dcfg, vocab, bbuckets,
                        run_predict, ensure_params, responses_for)

    if src is not sys.stdin:
        src.close()
    if sink is not sys.stdout:
        sink.close()
    if served == 0:
        print("[serve] no requests", file=sys.stderr)
        return
    print(f"[serve] {served} requests answered (epoch {epoch}, "
          f"{'bf16' if args.bf16 else 'f32'})", file=sys.stderr)


if __name__ == "__main__":
    main()

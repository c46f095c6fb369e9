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
(zero dependencies — stdlib http.server): POST JSONL request lines to
``/``, receive JSONL responses; GET ``/healthz`` for liveness and
``/varz`` for serving stats (requests, batches, occupancy, batch
latency, errors). Concurrent
client requests are coalesced into device batches (``--max_wait_ms``
window, ``--batch_size`` cap) with pipelined dispatch, composing with
``--pool_buckets`` (each coalesced batch runs at the smallest static pool
size that fits its largest request).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List

import numpy as np

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data.featurize import featurize
from ..data.text import split_sentences
from ..data.vocab import Vocabulary
from ..models import build_model_cfg, create_model
from ..runtime.inference import make_predict_fn
from ..runtime.io import ids_to_sentence, remove_duplicate
from ..train.checkpoint import checkpoint_exists, latest_epoch, load_checkpoint


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
    p.add_argument("--batch_size", type=int, default=64)
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
    p.add_argument("--fast_argmax", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="scatter-free decode argmax (auto: case/masque on "
                        "for bf16 on a single TPU chip, off for f32; "
                        "glks/gttp auto keeps the dense scatter — measured "
                        "faster for them; --no-fast_argmax forces the "
                        "dense scatter everywhere)")
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


def featurize_requests(requests: List[dict], model: str, vocab: Vocabulary,
                       dcfg: DataConfig) -> Dict[str, np.ndarray]:
    """Requests -> the same fixed-shape arrays the offline pipeline emits
    (tokenization mirrors data/loaders.load_query/load_passage).

    All texts of the chunk (queries, history turns, passage sentences) are
    tokenized in ONE native batch call — the per-sentence ctypes crossing
    dominated the host featurizer at device-rate serving (docs/PERF.md)."""
    tok = vocab.tokenizer()
    texts: List[str] = []
    meta = []   # per request: (query_i, [hist_i], [[sent_i per passage]])
    for i, req in enumerate(requests):
        qi = len(texts)
        texts.append(req.get("query", ""))
        his = []
        for h in req.get("history", []):
            his.append(len(texts))
            texts.append(h)
        n_pass = len(req.get("passages", []))
        if n_pass > dcfg.num_passage:
            print(f"[serve] warning: request {req.get('id', i)!r} has "
                  f"{n_pass} passages; only the first {dcfg.num_passage} "
                  "are scored (raise --num_passage to cover the pool)",
                  file=sys.stderr)
        ps = []
        # passages beyond the pool size are discarded by featurize() —
        # don't pay to sentence-split/tokenize them (the warning above
        # already fired)
        for ptext in req.get("passages", [])[: dcfg.num_passage]:
            sidx = []
            for sent in split_sentences(ptext):
                sidx.append(len(texts))
                texts.append(sent)
            ps.append(sidx)
        meta.append((qi, his, ps))
    toked = tok.batch(texts)

    query: Dict[str, List[str]] = {}
    passage: Dict[str, List[str]] = {}
    samples = []
    for i, (qi, his, ps) in enumerate(meta):
        qid = f"q{i}"
        query[qid] = toked[qi]
        ctx_ids = []
        for j, hi in enumerate(his):
            cid = f"q{i}_h{j}"
            query[cid] = toked[hi]
            ctx_ids.append(cid)
        pool = []
        for j, sidx in enumerate(ps):
            pid = f"p{i}_{j}"
            joined = " [SEP] ".join(" ".join(toked[s]) for s in sidx)
            passage[pid] = joined.split(" ") if joined else []
            pool.append(pid)
        samples.append({"query_id": qid, "context_id": ctx_ids,
                        "passage_pool_id": pool, "passage_id": [],
                        "answer": []})
    arrays = featurize(model, samples, query, passage, vocab, None, dcfg)
    return arrays


def _chunk_to_batch(chunk: List[dict], model: str, vocab: Vocabulary,
                    dcfg: DataConfig, bs: int) -> Dict[str, np.ndarray]:
    """Featurize one request chunk into a fixed-size padded batch
    (pad rows repeat the last request; sample_weight flags them).

    A request's optional ``max_tokens`` becomes the per-row response cap
    (``response_cap``): the continuous decode ends the row there; the
    batch paths truncate host-side (greedy/sampled prefixes are
    unaffected by later steps, so both give the same answer)."""
    arrays = featurize_requests(chunk, model, vocab, dcfg)
    real = len(chunk)
    batch: Dict[str, np.ndarray] = {}
    for k, v in arrays.items():
        if k == "passage_labels":
            continue
        batch[k] = np.concatenate([v, np.repeat(v[-1:], bs - real, axis=0)]) \
            if real < bs else v
    if "passage_labels" in arrays:   # no golds at serving time
        batch["passage_label"] = np.zeros(bs, np.int32)
    w = np.zeros(bs, np.float32)
    w[:real] = 1.0
    batch["sample_weight"] = w
    cap = np.full(bs, dcfg.answer_len, np.int32)
    for i, r in enumerate(chunk):
        if "max_tokens" in r:
            cap[i] = max(1, min(int(r["max_tokens"]), dcfg.answer_len))
    batch["response_cap"] = cap
    return batch


def _read_requests(src):
    for line in src:
        if line.strip():
            yield json.loads(line)


def _read_chunks(src, size: int):
    chunk: List[dict] = []
    for req in _read_requests(src):
        chunk.append(req)
        if len(chunk) == size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def _bucket_for(n_passages: int, buckets: List[int]) -> int:
    """Smallest bucket that fits the pool (over-long pools get the largest
    bucket and are truncated with the featurizer's warning)."""
    for b in buckets:
        if n_passages <= b:
            return b
    return buckets[-1]


def _make_lanes(cont, bs: int, refill_size: int, wrap=None, key=None):
    """One continuous-decode Lane per pool bucket + a request router
    (``--pool_buckets x --continuous``). ``wrap`` optionally wraps each
    lane's make_batch (HTTP failure isolation); ``key(item) -> n_passages``
    adapts routing to the source's item shape (the HTTP queue wraps each
    request dict in a waiter record)."""
    from ..runtime.continuous import Lane
    lanes = {}
    for k in cont["buckets"]:
        mb = cont["make_batch_for"][k]
        lanes[k] = Lane(k, mb if wrap is None else wrap(mb), cont["init"],
                        cont["chunk"], cont["refill"], bs, refill_size,
                        refill_min=cont.get("refill_min", 1))
    getn = key or (lambda req: len(req.get("passages", [])))

    def route(item):
        return lanes[_bucket_for(getn(item), cont["buckets"])]
    return list(lanes.values()), route


def _parse_buckets(spec: str, cap: int,
                   flag: str = "--pool_buckets") -> List[int]:
    """Parse a bucket-size list; ``cap`` (num_passage resp. batch_size)
    always joins as the largest bucket so inputs bigger than every listed
    bucket still run at the full configured size (not silently truncated)."""
    buckets = {int(x) for x in spec.split(",") if x}
    if any(b <= 0 for b in buckets):
        raise SystemExit(f"{flag} entries must be positive")
    buckets.add(cap)
    return sorted(buckets)


def _serve_http(args, dcfg, ensure_params, responses_for, run_predict,
                vocab, bbuckets, server_ready=None, cont=None):
    """HTTP micro-batching server (``--listen``).

    Handler threads only enqueue requests and wait on per-request events;
    a single dispatcher thread owns all device work (featurize -> dispatch),
    and a completer thread fetches results and releases the waiters — the
    dispatch/fetch split pipelines the host roundtrip exactly like the
    offline path (docs/PERF.md). Requests arriving within ``--max_wait_ms``
    of each other coalesce into one device batch (up to ``--batch_size``).
    With ``--pool_buckets``, each coalesced batch runs at the smallest
    static pool size that fits its largest request.

    ``cont`` (from ``--continuous``) replaces dispatcher+completer with
    one worker driving the continuous decode loop: requests join the
    in-flight batch as rows free up (no coalescing window needed — the
    decode state IS the batch), and each waiter is released the moment
    its row finishes (``ordered=False``)."""
    import dataclasses
    import queue
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    bs = args.batch_size
    buckets = _parse_buckets(args.pool_buckets, dcfg.num_passage) \
        if args.pool_buckets else []
    dcfgs = {k: dataclasses.replace(dcfg, num_passage=k) for k in buckets}
    arrival = iter(range(1 << 62))   # fallback ids = arrival order
    arrival_lock = threading.Lock()
    stats = {"requests": 0, "batches": 0, "errors": 0,
             "batch_rows": 0, "batch_seconds": 0.0}
    stats_lock = threading.Lock()
    from collections import deque as _deque
    latencies: "_deque" = _deque(maxlen=1000)   # last-N request latencies

    def note_done(items):
        now = time.monotonic()
        with stats_lock:
            for p in items:
                if "t_in" in p:
                    latencies.append(now - p["t_in"])

    reqq: queue.Queue = queue.Queue()
    doneq: queue.Queue = queue.Queue(maxsize=max(args.pipeline_depth, 1))
    stop = object()
    lane_holder: Dict[str, list] = {}   # multi-lane worker publishes lanes

    def fail_items(items, exc):
        # a bad request must not kill the serving threads: release its
        # waiters with an error payload and keep going
        print(f"[serve] batch failed: {exc!r}", file=sys.stderr)
        note_done(items)
        with stats_lock:
            stats["errors"] += len(items)
        for p in items:
            p["resp"] = {"id": p["req"].get("id", p["seq"])
                         if isinstance(p["req"], dict) else p["seq"],
                         "error": str(exc)}
            if "stream_q" in p:   # unblock a streaming handler too
                p["stream_q"].put(dict(p["resp"], done=True))
            p["event"].set()

    def dispatcher():
        while True:
            item = reqq.get()
            if item is stop:
                doneq.put(stop)
                return
            items = [item]
            deadline = time.monotonic() + args.max_wait_ms / 1000.0
            while len(items) < bs:
                t = deadline - time.monotonic()
                if t <= 0:
                    break
                try:
                    nxt = reqq.get(timeout=t)
                except queue.Empty:
                    break
                if nxt is stop:
                    reqq.put(stop)   # re-queue: stop after this batch
                    break
                items.append(nxt)
            try:
                chunk = [p["req"] for p in items]
                if buckets:
                    k = _bucket_for(max(len(r.get("passages", []))
                                        for r in chunk), buckets)
                    dk = dcfgs[k]
                else:
                    dk = dcfg
                batch = _chunk_to_batch(chunk, args.model, vocab, dk,
                                        _bucket_for(len(chunk), bbuckets))
                ensure_params(batch)
                doneq.put((items, run_predict(batch), dk, time.monotonic()))
            except Exception as e:   # malformed request, featurize error, ...
                fail_items(items, e)

    def continuous_worker():
        from ..runtime.continuous import QueueSource, run_continuous_multi

        live = []   # items in slots, for failure cleanup

        def wrap_mb(mb):
            def make_batch(items, k):
                try:
                    batch = mb([p["req"] for p in items], k)
                    live.extend(items)
                    return batch
                except Exception as e:   # malformed request, featurize error
                    fail_items(items, e)
                    return None
            return make_batch

        def emit(item, ids_row, rank_row):
            try:
                item["resp"] = responses_for(
                    [item["req"]], cont["row_out"](ids_row, rank_row), dcfg,
                    default_ids=[item["seq"]])[0]
                if "stream_q" in item:   # final authoritative line
                    item["stream_q"].put(dict(item["resp"], done=True))
                item["event"].set()
                note_done([item])
                with stats_lock:
                    stats["requests"] += 1
            except Exception as e:
                fail_items([item], e)
            finally:
                # drop the streaming cursor on BOTH outcomes (seq keys are
                # never reused, so a missed pop could only leak, not
                # poison a later stream — but don't leak either)
                last_sent.pop(item["seq"], None)
            if item in live:
                live.remove(item)

        def on_chunk(chunks):
            with stats_lock:
                stats["batches"] = chunks

        # token streaming ("stream": true requests): after every chunk,
        # push the newly decoded words of each live streaming row to its
        # handler. Deltas are detokenized word fragments (wordpiece joins
        # can differ across a fragment boundary); the final line carries
        # the authoritative full answer + ranking.
        from ..runtime.io import ids_to_words
        detok = vocab.detokenizer()
        last_sent: Dict[int, int] = {}   # item seq -> words streamed

        def stream_cb(host, slots):
            # ``host`` carries already-fetched numpy out/trow (one combined
            # device_get per chunk in the loop — no extra roundtrips here)
            live_s = [(r, s[1]) for r, s in enumerate(slots)
                      if s is not None and "stream_q" in s[1]]
            if not live_s:
                return
            out_h = host["out"]
            trow_h = host["trow"]
            for r, item in live_s:
                words = ids_to_words(out_h[r][: int(trow_h[r])], vocab)
                sent = last_sent.get(item["seq"], 0)
                if len(words) > sent:
                    item["stream_q"].put(
                        {"id": item["req"].get("id", item["seq"]),
                         "delta": detok(words[sent:])})
                    last_sent[item["seq"]] = len(words)

        # the worker owns the device: a compile/device error must not
        # strand current waiters or future requests behind a dead thread
        # (the dispatcher/completer pair guards the same way)
        try:
            src = QueueSource(reqq, stop)
            if "buckets" in cont:
                lanes, route = _make_lanes(
                    cont, bs, cont["refill_size"], wrap=wrap_mb,
                    key=lambda p: len(p["req"].get("passages", [])))
                lane_holder["lanes"] = lanes
                run_continuous_multi(src, lanes, route, None, emit,
                                     ordered=False, on_chunk=on_chunk,
                                     stream_cb=stream_cb)
            else:
                cont["run"](src, wrap_mb(cont["make_batch"]), cont["init"],
                            cont["chunk"], cont["refill"], None, bs,
                            cont["refill_size"], emit,
                            args.max_target_length,
                            ordered=False, on_chunk=on_chunk,
                            lookahead=cont["lookahead"],
                            refill_min=cont["refill_min"],
                            stream_cb=stream_cb)
        except Exception as e:
            print(f"[serve] continuous worker failed: {e!r}",
                  file=sys.stderr)
            fail_items([p for p in live if not p["event"].is_set()], e)
            while True:   # keep answering with errors instead of timeouts
                item = reqq.get()
                if item is stop:
                    return
                fail_items([item], e)

    def completer():
        while True:
            got = doneq.get()
            if got is stop:
                return
            items, out, dk, t_dispatch = got
            try:
                chunk = [p["req"] for p in items]
                seqs = [p["seq"] for p in items]
                resps = responses_for(chunk, out, dk, default_ids=seqs)
                for p, resp in zip(items, resps):
                    p["resp"] = resp
                    p["event"].set()
                note_done(items)
                with stats_lock:
                    stats["requests"] += len(items)
                    stats["batches"] += 1
                    stats["batch_rows"] += len(items)
                    stats["batch_seconds"] += time.monotonic() - t_dispatch
            except Exception as e:   # device failure must not strand waiters
                fail_items(items, e)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):   # keep stderr quiet under load
            pass

        def _send(self, code, data, ctype="application/jsonl"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok\n", "text/plain")
            elif self.path == "/varz":
                with stats_lock:
                    n, b_ = stats["requests"], stats["batches"]
                    varz = {"requests_served": n, "batches": b_,
                            "errors": stats["errors"],
                            "mean_batch_occupancy":
                                round(stats["batch_rows"] / b_, 2) if b_ else 0,
                            # dispatch -> completion, INCLUDING time queued
                            # behind other in-flight batches: pipeline
                            # residence, not device batch latency (can read
                            # up to pipeline_depth x the device time under
                            # sustained load)
                            "mean_batch_residence_s":
                                round(stats["batch_seconds"] / b_, 4)
                                if b_ else 0,
                            "batch_size": bs, "pool_buckets": buckets,
                            "batch_buckets": bbuckets,
                            "max_wait_ms": args.max_wait_ms,
                            "continuous": cont is not None}
                    if latencies:
                        ls = sorted(latencies)

                        def pct(q):
                            return round(ls[min(len(ls) - 1,
                                                int(q * len(ls)))], 4)
                        varz["request_latency_s"] = {
                            "p50": pct(0.50), "p90": pct(0.90),
                            "p99": pct(0.99), "n": len(ls)}
                    if lane_holder:
                        # racy-but-safe snapshot (GIL list reads) of each
                        # continuous lane's live occupancy and queue depth
                        varz["lanes"] = {
                            str(ln.key): {
                                "occupied": sum(s is not None
                                                for s in ln.slots),
                                "queued": len(ln.queue)}
                            for ln in lane_holder["lanes"]}
                self._send(200, (json.dumps(varz) + "\n").encode(),
                           "application/json")
            else:
                self._send(404, b"not found\n", "text/plain")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0) or 0)
            body = self.rfile.read(length).decode("utf-8")
            try:
                reqs = [json.loads(line) for line in body.splitlines()
                        if line.strip()]
                if not all(isinstance(r, dict) for r in reqs):
                    raise ValueError("each line must be a JSON object")
            except (json.JSONDecodeError, ValueError) as e:
                self._send(400, f"bad request line: {e}\n".encode(),
                           "text/plain")
                return
            if not reqs:
                self._send(400, b"empty body\n", "text/plain")
                return
            if any(r.get("stream") for r in reqs):
                # token streaming: JSONL lines flushed as the row decodes —
                # {"id", "delta"} per chunk, then the authoritative
                # {"id", "answer", "ranking", "done": true}. HTTP/1.0
                # close-delimited body (no Content-Length); one streaming
                # request per POST.
                if cont is None or len(reqs) != 1:
                    self._send(400, b"streaming requests need --continuous "
                               b"serving and exactly one request per POST\n",
                               "text/plain")
                    return
                with arrival_lock:
                    item = {"req": reqs[0], "resp": None,
                            "seq": next(arrival), "t_in": time.monotonic(),
                            "event": threading.Event(),
                            "stream_q": queue.Queue()}
                reqq.put(item)
                self.send_response(200)
                self.send_header("Content-Type", "application/jsonl")
                self.end_headers()
                while True:
                    try:
                        msg = item["stream_q"].get(
                            timeout=args.request_timeout)
                    except queue.Empty:
                        msg = {"id": item["req"].get("id", item["seq"]),
                               "error": "timed out", "done": True}
                    self.wfile.write((json.dumps(msg) + "\n").encode())
                    self.wfile.flush()
                    if msg.get("done"):
                        return
            with arrival_lock:
                pend = [{"req": r, "resp": None, "seq": next(arrival),
                         "t_in": time.monotonic(),
                         "event": threading.Event()} for r in reqs]
            for p in pend:
                reqq.put(p)
            ok = all(p["event"].wait(timeout=args.request_timeout)
                     for p in pend)
            if not ok:
                self._send(503, b"timed out\n", "text/plain")
                return
            out = "".join(json.dumps(p["resp"]) + "\n" for p in pend)
            self._send(200, out.encode("utf-8"))

    host, _, port = args.listen.rpartition(":")
    server = ThreadingHTTPServer((host or "127.0.0.1", int(port)), Handler)
    if cont is not None:
        threads = [threading.Thread(target=continuous_worker, daemon=True)]
    else:
        threads = [threading.Thread(target=dispatcher, daemon=True),
                   threading.Thread(target=completer, daemon=True)]
    for t in threads:
        t.start()
    print(f"[serve] listening on http://{server.server_address[0]}:"
          f"{server.server_address[1]} "
          + (f"(continuous batch {bs}, chunk {args.chunk_steps}, "
             f"refill {cont['refill_size']})" if cont is not None else
             f"(batch {bs}, window {args.max_wait_ms} ms)"),
          file=sys.stderr)
    if server_ready is not None:
        server_ready(server)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        reqq.put(stop)
        for t in threads:
            t.join(timeout=30)
        server.server_close()


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

    if args.bf16_scores:
        from ..ops.attention import set_bf16_scores
        set_bf16_scores(True)
    if not args.fused_attn:
        from ..ops.attention import set_fused_attention
        set_fused_attention(False)

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

        bbuckets = _parse_buckets(args.batch_buckets, bs, "--batch_buckets") \
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
            pools = (_parse_buckets(args.pool_buckets, dcfg.num_passage)
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
        # tracks the MEAN answer length instead of the batch max.
        if args.batch_buckets or args.rank_only or args.beam_width > 1:
            raise SystemExit("--continuous composes with none of "
                             "--batch_buckets/--rank_only/--beam_width>1")
        if args.pool_buckets and args.lookahead:
            raise SystemExit("--lookahead applies to single-lane "
                             "--continuous only; with --pool_buckets the "
                             "multi-lane driver already overlaps each "
                             "lane's harvest with the other lanes' chunks")
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
                batch = _chunk_to_batch(chunk, args.model, vocab, dk, k)
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
                "refill_min": args.refill_min}
        if args.pool_buckets:
            # multi-lane continuous serving: one lane (own decode state +
            # cached XLA programs) per static pool size; requests route to
            # the smallest bucket that fits and still refill mid-flight.
            # The jitted fns are shared — jit caches one executable per
            # state shape, i.e. per bucket.
            import dataclasses
            cbuckets = _parse_buckets(args.pool_buckets, dcfg.num_passage)
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
            else (_parse_buckets(args.pool_buckets, dcfg.num_passage)
                  if args.pool_buckets else [dcfg.num_passage])
        if cont is not None:
            mbs = cont["make_batch_for"] if "buckets" in cont else \
                {pools[0]: cont["make_batch"]}
            for k, mb in mbs.items():
                for width in {bs, args.refill}:
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
                    batch = _chunk_to_batch([warm_req(k)], args.model,
                                            vocab, dk, width)
                    ensure_params(batch)
                    jax.block_until_ready(
                        jax.tree_util.tree_leaves(run_predict(batch))[0])
        kind = "continuous" if cont is not None else "predict"
        print(f"[serve] warmup compiled {kind} programs (pools {pools}) "
              f"in {_time.time()-t0:.0f}s", file=sys.stderr)

    if args.listen:
        _serve_http(args, dcfg, ensure_params, responses_for, run_predict,
                    vocab, bbuckets, _server_ready, cont=cont)
        return

    src = sys.stdin if args.input == "-" else open(args.input,
                                                  encoding="utf-8")
    sink = sys.stdout if args.output == "-" else open(args.output, "w",
                                                      encoding="utf-8")

    if cont is not None:
        def emit(req, ids_row, rank_row):
            resp = responses_for([req], cont["row_out"](ids_row, rank_row),
                                 dcfg)[0]
            sink.write(json.dumps(resp) + "\n")
            sink.flush()

        # stdin may be a long-lived trickling pipe: a blocking read must
        # not stall in-flight rows (IterSource docstring), so stream it
        # through a reader thread + QueueSource; regular files read
        # without meaningful blocking and keep the plain iterator
        if src is sys.stdin:
            import queue as _queue
            import threading as _threading

            from ..runtime.continuous import QueueSource
            _q: "_queue.Queue" = _queue.Queue()
            _stop = object()

            def _reader():
                for r in _read_requests(src):
                    _q.put(r)
                _q.put(_stop)

            _threading.Thread(target=_reader, daemon=True).start()
            source = QueueSource(_q, _stop)
        else:
            source = _read_requests(src)

        if "buckets" in cont:
            from ..runtime.continuous import run_continuous_multi
            lanes, route = _make_lanes(cont, bs, args.refill)
            stats = run_continuous_multi(source, lanes, route, None, emit)
        else:
            stats = cont["run"](
                source, cont["make_batch"], cont["init"],
                cont["chunk"], cont["refill"], None, bs, args.refill, emit,
                args.max_target_length, lookahead=cont["lookahead"],
                refill_min=cont["refill_min"])
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

    # streaming loop: consume batch_size chunks as they arrive, keep up to
    # pipeline_depth batches in flight, flush each chunk's responses as
    # soon as its result is fetched (pipelined dispatch — docs/PERF.md)
    from collections import deque
    inflight: deque = deque()

    if not args.pool_buckets:
        def write_responses(chunk, out, dcfg_k):
            for resp in responses_for(chunk, out, dcfg_k):
                sink.write(json.dumps(resp) + "\n")
            sink.flush()

        for chunk in _read_chunks(src, bs):
            batch = _chunk_to_batch(chunk, args.model, vocab, dcfg,
                                    _bucket_for(len(chunk), bbuckets))
            ensure_params(batch)
            inflight.append((chunk, run_predict(batch), dcfg))
            while len(inflight) >= max(args.pipeline_depth, 1):
                write_responses(*inflight.popleft())
        while inflight:
            write_responses(*inflight.popleft())
    else:
        # bucketed pools: per-bucket chunk accumulation, one XLA program
        # per static pool size (jit caches by shape); input order restored
        # by a seqno reorder buffer before writing
        import dataclasses
        buckets = _parse_buckets(args.pool_buckets, dcfg.num_passage)
        dcfgs = {k: dataclasses.replace(dcfg, num_passage=k)
                 for k in buckets}
        # a part-filled bucket dispatches once flush_after newer requests
        # have been read past its oldest entry: bounds response latency and
        # reorder-buffer growth when streaming from a long-lived stdin pipe
        flush_after = args.bucket_flush_after or 2 * bs
        accum: Dict[int, List] = {k: [] for k in buckets}  # (seq, req)
        pending: Dict[int, dict] = {}
        next_emit = 0

        def emit_ready():
            nonlocal next_emit
            wrote = False
            while next_emit in pending:
                sink.write(json.dumps(pending.pop(next_emit)) + "\n")
                next_emit += 1
                wrote = True
            if wrote:
                sink.flush()

        def drain_one():
            chunk, seqs, out, dcfg_k = inflight.popleft()
            resps = responses_for(chunk, out, dcfg_k, default_ids=seqs)
            for s, resp in zip(seqs, resps):
                pending[s] = resp
            emit_ready()

        def dispatch(k):
            entries = accum[k]
            accum[k] = []
            seqs = [s for s, _ in entries]
            chunk = [r for _, r in entries]
            batch = _chunk_to_batch(chunk, args.model, vocab, dcfgs[k],
                                    _bucket_for(len(chunk), bbuckets))
            ensure_params(batch)
            inflight.append((chunk, seqs, run_predict(batch), dcfgs[k]))
            while len(inflight) >= max(args.pipeline_depth, 1):
                drain_one()

        for seq, req in enumerate(_read_requests(src)):
            k = _bucket_for(len(req.get("passages", [])), buckets)
            accum[k].append((seq, req))
            if len(accum[k]) == bs:
                dispatch(k)
            for j in buckets:   # age out part-filled buckets
                if accum[j] and seq - accum[j][0][0] >= flush_after:
                    dispatch(j)
        for k in buckets:
            if accum[k]:
                dispatch(k)
        while inflight:
            drain_one()

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

"""End-to-end HTTP serving load test (cli/serve.py --listen).

Drives the micro-batching server with concurrent JSONL POSTs at full CaSE
scale (V=30522, d=256, 10x100 pools, B=64 bf16) and measures sustained
queries/sec through the WHOLE serving stack: HTTP handling, host
featurization (C++ WordPiece fast path), request coalescing, pipelined
dispatch, decode, detokenization. Compare against bench.py's device-side
~500 qps: host featurization measures ~65 ms/batch and overlaps device
compute in the dispatcher thread, so the server should sustain close to
the device-bound rate.

Setup (one-time, documented in docs/PERF.md): a synthetic 30522-token
vocab at /tmp/http_bench/prepared/vocab.txt and a random full-size
checkpoint at /tmp/http_bench/out (init_state on CPU + save_checkpoint).

Usage: python tools/exp_http_load.py [clients] [batches_per_client]
       [--continuous [chunk_steps refill]]

``--continuous`` serves through the continuous-batching worker instead of
the micro-batching dispatcher. Random weights never emit EOS, so every
row runs all 40 steps — this measures the continuous loop's OVERHEAD
(per-chunk host sync + refill encodes) at equal decode work, the
worst case for it; the length-mix win is measured separately by
tools/exp_continuous.py (EOS-retagged).
"""

import json
import random
import sys
import threading
import time
import urllib.request


def main():
    argv = list(sys.argv[1:])
    cont_args = []
    if "--continuous" in argv:
        i = argv.index("--continuous")
        rest = argv[i + 1:i + 3]
        chunk = rest[0] if len(rest) > 0 and not rest[0].startswith("-") else "8"
        refill = rest[1] if len(rest) > 1 and not rest[1].startswith("-") else "16"
        cont_args = ["--continuous", "--chunk_steps", chunk,
                     "--refill", refill]
        del argv[i:i + 1 + len([x for x in rest if not x.startswith("-")])]
    # strip the continuous-only flags unconditionally: left in argv they
    # would land in the positional int() parse below
    if "--lookahead" in argv:
        if not cont_args:
            raise SystemExit("--lookahead requires --continuous")
        cont_args.append("--lookahead")
        argv.remove("--lookahead")
    if "--refill_min" in argv:
        if not cont_args:
            raise SystemExit("--refill_min requires --continuous")
        j = argv.index("--refill_min")
        cont_args += ["--refill_min", argv[j + 1]]
        del argv[j:j + 2]
    clients = int(argv[0]) if len(argv) > 0 else 4
    per_client = int(argv[1]) if len(argv) > 1 else 4
    bs = 64

    from case_rg_tpu.cli.serve import main as serve_main

    holder = {}
    ready = threading.Event()

    def on_ready(server):
        holder["server"] = server
        ready.set()

    serve_argv = ["--model", "case",
                  "--prepared_dir", "/tmp/http_bench/prepared",
                  "--output_path", "/tmp/http_bench/out",
                  "--batch_size", str(bs), "--bf16",
                  "--listen", "127.0.0.1:0",
                  "--max_wait_ms", "100"] + cont_args
    t = threading.Thread(target=serve_main, args=(serve_argv,),
                         kwargs={"_server_ready": on_ready}, daemon=True)
    t.start()
    assert ready.wait(timeout=120)
    host, port = holder["server"].server_address[:2]
    base = f"http://{host}:{port}"

    rng = random.Random(0)
    words = [f"w{i:05d}" for i in range(20000)]

    def body(n, tag):
        lines = []
        for i in range(n):
            req = {"id": f"{tag}_{i}",
                   "query": " ".join(rng.choice(words) for _ in range(8)) + " ?",
                   "history": [" ".join(rng.choice(words) for _ in range(8))],
                   "passages": [" ".join(rng.choice(words)
                                         for _ in range(90)) + " ."
                                for _ in range(10)]}
            lines.append(json.dumps(req))
        return ("\n".join(lines) + "\n").encode()

    def post(data):
        req = urllib.request.Request(base + "/", data=data, method="POST")
        with urllib.request.urlopen(req, timeout=1800) as r:
            assert r.status == 200
            return sum(1 for l in r.read().decode().splitlines() if l.strip())

    print("warmup (compile)...", flush=True)
    t0 = time.time()
    n = post(body(bs, "warm"))
    print(f"warmup: {n} responses in {time.time()-t0:.1f}s", flush=True)

    counts = []

    def client(c):
        done = 0
        for b in range(per_client):
            done += post(body(bs, f"c{c}b{b}"))
        counts.append(done)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    dt = time.time() - t0
    total = sum(counts)
    print(f"{clients} clients x {per_client} x {bs} requests: "
          f"{total} answered in {dt:.1f}s -> {total/dt:.0f} qps "
          f"end-to-end through HTTP")
    holder["server"].shutdown()
    t.join(timeout=60)


if __name__ == "__main__":
    main()

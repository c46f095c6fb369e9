"""Attribute the train step's copy/layout bucket op by op.

The round-12 xprof (docs/PERF.md) put copy/layout at 46.5 ms/step (17.8%)
of the CaSE train step but the trace only shows opaque ``copy.N`` names.
This tool compiles the SHIPPED ``Trainer.train_step`` and cross-references:

1. the optimized HLO text — every ``copy``/``transpose`` instruction with
   its shape, layout annotation, and byte size (what is being moved and
   between which layouts);
2. (optional, ``--trace LOGDIR``) a previously captured xprof trace — the
   measured device time per op name, joined onto (1).

Without a trace it still ranks copies by bytes moved (a lower bound on
their HBM cost at the 819 GB/s ceiling). Usage:

    python tools/exp_train_copyops.py [B] [--dtype bf16] [--small]
        [--trace /tmp/xprof_train_bf16_b64]
"""

import os
import re
import sys
from collections import defaultdict

import numpy as np

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}

_SHAPE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?P<name>[\w.\-]+)\s*=\s*"
    r"(?P<dt>\w+)\[(?P<dims>[\d,]*)\](?:{(?P<layout>[^}]*)})?\s+"
    r"(?P<op>copy|transpose|bitcast|concatenate)\(")


def _bytes(dt, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def scan_hlo(hlo: str, min_mb: float = 0.5):
    rows = []
    for line in hlo.splitlines():
        m = _SHAPE_RE.match(line)
        if not m:
            continue
        b = _bytes(m.group("dt"), m.group("dims"))
        rows.append({
            "name": m.group("name"), "op": m.group("op"),
            "shape": f'{m.group("dt")}[{m.group("dims")}]',
            "layout": m.group("layout") or "",
            "mb": b / 1e6,
            "line": line.strip()[:160],
        })
    rows.sort(key=lambda r: -r["mb"])
    groups = defaultdict(lambda: [0, 0.0])
    for r in rows:
        if r["op"] == "bitcast":
            continue   # layout reinterpretation — no data movement
        g = groups[(r["op"], r["shape"])]
        g[0] += 1
        g[1] += r["mb"]
    print(f"{'op':<13}{'shape':<34}{'n':>5}{'total MB':>10}"
          f"{'~ms @819GB/s':>14}")
    shown = 0
    for (op, shape), (n, mb) in sorted(groups.items(),
                                       key=lambda kv: -kv[1][1]):
        if mb < min_mb and shown > 10:
            break
        # a copy reads + writes every byte -> 2x traffic
        print(f"{op:<13}{shape:<34}{n:>5}{mb:>10.1f}"
              f"{2 * mb / 819e3 * 1e3:>14.3f}")
        shown += 1
    total = sum(mb for _, mb in groups.values())
    print(f"\ntotal copy/transpose/concat bytes (bitcasts excluded — "
          f"free): {total:.0f} MB "
          f"(~{2 * total / 819e3 * 1e3:.1f} ms of HBM traffic/step)")
    return rows


def trace_durations(logdir):
    """op name -> device microseconds, from the newest trace in logdir."""
    import glob
    import gzip
    import json
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_xprof_decode import _device_pid, _tid_names
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        evs = json.load(f).get("traceEvents", [])
    pid = _device_pid(evs)
    tids = _tid_names(evs, pid)
    ops_tids = {t for t, n in tids.items() if n == "XLA Ops"}
    out = defaultdict(float)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") == pid \
                and e.get("tid") in ops_tids:
            out[e.get("name", "?")] += e.get("dur", 0)
    return out


def main(argv):
    B = 64
    dtype = "bf16"
    small = "--small" in argv
    if small:
        argv.remove("--small")
    trace_dir = None
    if "--trace" in argv:
        i = argv.index("--trace")
        trace_dir = argv[i + 1]
        del argv[i:i + 2]
    if "--dtype" in argv:
        i = argv.index("--dtype")
        dtype = argv[i + 1]
        del argv[i:i + 2]
    if argv:
        B = int(argv[0])

    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from case_rg_tpu.config import ModelConfig, TrainConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.train.trainer import Trainer

    v, lq, lp, npass, la = ((512, 10, 12, 3, 8) if small
                            else (30522, 60, 100, 10, 40))
    cfg = ModelConfig(name="case", vocab_size=v,
                      embedding_size=16 if small else 256,
                      hidden_size=16 if small else 256,
                      num_heads=2 if small else 8,
                      enc_layers=1 if small else 3,
                      dec_layers=1 if small else 4,
                      max_dec_len=la, max_target_length=la)
    model = create_model("case", cfg)
    rng = np.random.RandomState(0)
    batch = {
        "query": jnp.asarray(rng.randint(4, v, size=(B, 1, lq)), jnp.int32),
        "passage": jnp.asarray(rng.randint(4, v, size=(B, npass, lp)),
                               jnp.int32),
        "response": jnp.asarray(rng.randint(4, v, size=(B, la)), jnp.int32),
        "passage_label": jnp.zeros((B,), jnp.int32),
        "token_label": jnp.zeros((B, npass, lp), jnp.float32),
        "token_weight": jnp.ones((B, npass, lp), jnp.float32),
    }
    tc = TrainConfig(batch_size=B, learning_rate=2.5e-4, warmup_steps=2000,
                     compute_dtype="bfloat16" if dtype == "bf16"
                     else "float32")
    trainer = Trainer(model, tc, total_steps=10000)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer._build_step()   # build WITHOUT executing (donation would
    # delete `state` before lower() could read its avals)
    print("lowering + compiling the shipped train step...", flush=True)
    compiled = trainer._train_step.lower(
        state, batch, jax.random.PRNGKey(1)).compile()
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines\n", flush=True)
    rows = scan_hlo(hlo)

    if trace_dir:
        durs = trace_durations(trace_dir)
        if durs:
            print("\nmeasured device time joined on op name "
                  f"(trace: {trace_dir}):")
            print(f"{'op name':<44}{'ms':>8}  shape")
            named = {r["name"]: r for r in rows}
            copies = [(n, d) for n, d in durs.items()
                      if n.split(".")[0] in ("copy", "transpose",
                                             "concatenate", "bitcast")]
            for n, d in sorted(copies, key=lambda kv: -kv[1])[:25]:
                shape = named.get(n, {}).get("shape", "?")
                print(f"{n[:43]:<44}{d/1e3:>8.2f}  {shape}")
            tot = sum(d for _, d in copies)
            print(f"total measured copy/layout: {tot/1e3:.1f} ms "
                  f"(over the traced steps)")


if __name__ == "__main__":
    main(list(sys.argv[1:]))

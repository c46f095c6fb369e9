"""Section-level attribution + roofline of the CaSE train step.

Round 14's xprof (tools/exp_xprof_train.py) put 67.7% of the 216 ms/step
device time in anonymous "fusion" ops with no statement of WHICH model
section they belong to, and the "bandwidth-bound" claim carried no
bytes/step number. This tool closes both gaps (VERDICT r4 item 1):

* ATTRIBUTION — every HLO instruction carries ``metadata={op_name=...}``
  with the flax module path (e.g. ``.../CaSEModel.stages/ps_tower/...``;
  backward ops are prefixed ``transpose(jvp(...))``). Fusions blend
  sections, so each fused computation's device time (from the xprof
  trace) is distributed over sections by the OUTPUT BYTES of its
  constituent instructions — a traffic-weighted split, honest for the
  elementwise-dominated fusions that make up the bucket.
* ROOFLINE — per-fusion HBM traffic is modeled as (operand bytes +
  output bytes) of the fusion call site (exactly XLA's own cost-model
  convention: fusion-internal temporaries live in registers/VMEM).
  Per-section achieved GB/s = attributed bytes / attributed time,
  reported as % of the v5e HBM peak (819 GB/s), next to the
  whole-program number from ``compiled.cost_analysis()``.

Sections: encoder (3 layers x 11 seqs), ps_tower / sti_tower (the two
Interaction towers), decoder (teacher-forced generation incl. the copy
extend), losses/glue (train_losses math outside submodules), optimizer
(clip -> adam -> schedule, EMA — everything in step_fn outside the
model), split fwd vs bwd where the jvp/transpose marker says so.

Usage:
  python tools/exp_train_sections.py [B] [--dtype bf16|f32] [--best]
      [--small] [--analyze]   # --analyze reuses the saved trace+HLO

Ref: the training loop being attributed replaces
common/CumulativeTrainer.py:52-78; the reference has no profiling at
all (SURVEY.md §5).
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

HBM_PEAK_GBS = 819.0    # v5e HBM bandwidth
BF16_PEAK_TFLOPS = 197.0

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of an HLO type string; sums tuple elements."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def section_of(op_name: str) -> str:
    """Map an HLO metadata op_name to a model section."""
    if not op_name:
        return "unattributed"
    n = op_name
    if "/encoder/" in n or "/encoder." in n:
        s = "encoder"
    elif "ps_tower" in n:
        s = "ps_tower"
    elif "sti_tower" in n:
        s = "sti_tower"
    elif "decoder" in n:            # decoder.teacher_force / decoder/...
        s = "decoder"
    elif "train_losses" in n or "stages" in n:
        s = "losses/glue"
    else:
        s = "optimizer"             # step_fn outside the model: clip,
        # adam, schedule, EMA, grad finalize
    bwd = "transpose(jvp" in n or "/transpose(" in n
    return s + ("[bwd]" if bwd else "[fwd]")


# --------------------------------------------------------------------------
# HLO parsing
# --------------------------------------------------------------------------

_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*((?:\([^)]*\)|[\w\[\],\{\}:\(\)\* ]+?))\s+"
    r"([\w\-]+)\(")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
_CALLS_RE = re.compile(r"calls=%?([\w\.\-]+)")
_OPERAND_RE = re.compile(r"%?([\w\.\-]+)")


def parse_hlo(text: str):
    """Return (instrs, computations).

    instrs: name -> dict(out_bytes, opcode, op_name, calls, operands,
                         comp) for every instruction in every computation.
    computations: comp_name -> [instruction names] in order.
    """
    instrs = {}
    computations = defaultdict(list)
    comp = None
    for line in text.splitlines():
        ls = line.strip()
        if ls.startswith("%") and ls.endswith("{") and "(" in ls:
            comp = ls.split()[0].lstrip("%")
            continue
        if ls.startswith("ENTRY"):
            comp = ls.split()[1].lstrip("%").rstrip(" {")
            continue
        if ls == "}":
            continue
        m = _INSTR_RE.match(line)
        if not m or comp is None:
            continue
        name, type_str, opcode = m.groups()
        if opcode == "parameter":
            continue
        rest = line[m.end():]
        # operand list: up to the closing paren at depth 0
        depth, i = 1, 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        operand_str = rest[:i]
        attrs = rest[i:]
        onm = _OPNAME_RE.search(attrs)
        cm = _CALLS_RE.search(attrs)
        operands = []
        for tok in operand_str.split(","):
            tok = tok.strip()
            mm = re.match(r"%?([\w\.\-]+)$", tok)
            if mm:
                operands.append(mm.group(1))
        instrs[name] = {
            "out_bytes": shape_bytes(type_str),
            "opcode": opcode,
            "op_name": onm.group(1) if onm else "",
            "calls": cm.group(1) if cm else None,
            "operands": operands,
            "comp": comp,
        }
        computations[comp].append(name)
    return instrs, computations


def build_attribution(instrs, computations):
    """name -> (hbm_bytes, {section: weight}) for entry-visible ops."""
    # parameters of the *entry* computation are HBM residents; fusion
    # operand bytes need each operand's def size — parameters of the
    # entry have no instr entry, so fall back to 0 (they are params of
    # fusions only when passed through; the caller's operand is an
    # entry-level instruction most of the time).
    def op_out_bytes(nm):
        e = instrs.get(nm)
        return e["out_bytes"] if e else 0

    # aliasing / bookkeeping opcodes move no HBM bytes of their own —
    # counting their (whole-state-tree) operands produced a phantom
    # ~118 GB/step "unattributed" row
    _NO_TRAFFIC = {"tuple", "get-tuple-element", "bitcast", "parameter",
                   "constant", "copy-start", "copy-done", "after-all"}
    attribution = {}
    for name, e in instrs.items():
        if e["opcode"] in _NO_TRAFFIC:
            hbm = 0
        else:
            hbm = e["out_bytes"] + sum(op_out_bytes(o)
                                       for o in e["operands"])
        if e["calls"] and e["calls"] in computations:
            weights = defaultdict(float)
            labeled = defaultdict(float)
            for inner in computations[e["calls"]]:
                ie = instrs[inner]
                w = max(ie["out_bytes"], 1)
                weights[section_of(ie["op_name"])] += w
                if ie["op_name"]:
                    labeled[section_of(ie["op_name"])] += w
            # unlabeled inner ops (layout copies, converts XLA inserted)
            # ride the labeled majority when any label exists
            if labeled:
                weights = labeled
            tot = sum(weights.values()) or 1.0
            weights = {k: v / tot for k, v in weights.items()}
        elif not e["op_name"]:
            # layout copies etc. inherit their (first attributable)
            # operand's section — one level is enough in practice
            weights = None
            for o in e["operands"]:
                oe = instrs.get(o)
                if oe is not None and oe["op_name"]:
                    weights = {section_of(oe["op_name"]): 1.0}
                    break
            if weights is None:
                weights = {"unattributed": 1.0}
        else:
            weights = {section_of(e["op_name"]): 1.0}
        attribution[name] = (hbm, weights)
    return attribution


# --------------------------------------------------------------------------
# trace parsing (chrome trace from jax.profiler)
# --------------------------------------------------------------------------

def load_trace_ops(logdir):
    """op name -> total device microseconds (XLA Ops lane)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_xprof_decode import _device_pid, _tid_names

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    pid = _device_pid(evs)
    tids = _tid_names(evs, pid)
    ops_tids = {t for t, n in tids.items() if n == "XLA Ops"}
    by_op = defaultdict(float)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") == pid \
                and e.get("tid") in ops_tids:
            by_op[e.get("name", "?").lstrip("%")] += e.get("dur", 0)
    return by_op


# --------------------------------------------------------------------------
# main
# --------------------------------------------------------------------------

def build_and_measure(B, dtype, best, small, hlo_path, logdir, steps=2,
                      rng_impl="rbg"):
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # match the cli/run shipped default (--fast_rng -> rbg); the older
    # train tools measured threefry by omission (see exp_train_bench)
    jax.config.update("jax_default_prng_impl",
                      "rbg" if rng_impl == "rbg" else "threefry2x32")
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
    if best:
        from case_rg_tpu.ops.attention import (set_bf16_scores,
                                               set_fused_train_attention,
                                               set_fused_train_attn_rng)
        set_bf16_scores(True)
        set_fused_train_attention(True)
        set_fused_train_attn_rng(True)   # round-15 shipped default for
        # bf16 training (in-kernel PRNG dropout; auto in cli/run)
    print(f"devices={jax.devices()} B={B} dtype={dtype} best={best}",
          flush=True)

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
    trainer._build_step()

    # ---- compiled HLO + cost analysis ----
    t0 = time.time()
    lowered = trainer._train_step.lower(state, batch, jax.random.PRNGKey(7))
    comp = lowered.compile()
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    txt = comp.as_text()
    with gzip.open(hlo_path, "wt") as f:
        f.write(txt)
    print(f"HLO {len(txt)/1e6:.1f} MB -> {hlo_path}", flush=True)
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    cost = {"flops": float(ca.get("flops", 0)),
            "bytes": float(ca.get("bytes accessed", 0))}
    with open(hlo_path + ".cost.json", "w") as f:
        json.dump(cost, f)

    key = jax.random.PRNGKey(7)

    def rolled(i):
        return {k: (jnp.roll(x, i, axis=-1)
                    if x.dtype == jnp.int32 and x.ndim > 1 else x)
                for k, x in batch.items()}

    key, sub = jax.random.split(key)
    t0 = time.time()
    state, losses = trainer.train_step(state, batch, sub)
    print(f"warm {time.time()-t0:.0f}s loss {float(losses['total']):.3f}",
          flush=True)

    # ---- steady-state ms/step: K distinct pipelined steps, 3 windows.
    # Batches are pre-built OUTSIDE the window: a jnp.roll inside the
    # timed loop is its own relay dispatch round-trip per step and
    # inflated the windows ~6x (round-15 finding; exp_train_bench always
    # pre-built). ----
    K = 12
    wins = []
    for w in range(3):
        bl = [rolled(w * K + i) for i in range(K)]
        for bt in bl:
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), bt)
        t0 = time.time()
        for bt in bl:
            key, sub = jax.random.split(key)
            state, losses = trainer.train_step(state, bt, sub)
        float(losses["total"])   # host fetch closes the window (relay rules)
        wins.append((time.time() - t0) / K * 1e3)
    ms_step = float(np.median(wins))
    print(f"ms/step median {ms_step:.1f} (windows "
          f"{', '.join(f'{x:.1f}' for x in wins)})", flush=True)
    with open(hlo_path + ".ms.json", "w") as f:
        json.dump({"ms_step": ms_step, "windows": wins, "B": B}, f)

    # ---- trace ----
    t0 = time.time()
    with jax.profiler.trace(logdir):
        for i in range(steps):
            key, sub = jax.random.split(key)
            state, losses = trainer.train_step(state, rolled(100 + i), sub)
            float(losses["total"])
    print(f"traced {steps} steps + stop in {time.time()-t0:.0f}s",
          flush=True)
    return ms_step, cost


def analyze(hlo_path, logdir, traced_steps=2):
    with gzip.open(hlo_path, "rt") as f:
        txt = f.read()
    with open(hlo_path + ".cost.json") as f:
        cost = json.load(f)
    with open(hlo_path + ".ms.json") as f:
        msj = json.load(f)
    ms_step, B = msj["ms_step"], msj["B"]

    instrs, computations = parse_hlo(txt)
    attribution = build_attribution(instrs, computations)
    by_op_us = load_trace_ops(logdir)

    sec_us = defaultdict(float)
    sec_bytes = defaultdict(float)
    missed_us = 0.0
    for op, us in by_op_us.items():
        att = attribution.get(op)
        if att is None:
            missed_us += us
            continue
        hbm, weights = att
        for s, w in weights.items():
            sec_us[s] += us * w
            sec_bytes[s] += hbm * w   # per-step: each entry op runs once
            # per step (us totals cover traced_steps executions — divided
            # out below)
    total_us = sum(sec_us.values()) + missed_us

    # merge fwd/bwd for the summary, keep the split
    def rollup(d):
        out = defaultdict(float)
        for k, v in d.items():
            out[k.split("[")[0]] += v
        return out

    sec_us_m, sec_bytes_m = rollup(sec_us), rollup(sec_bytes)
    print(f"\n== train step attribution (B={B}, {traced_steps} traced "
          f"steps; e2e {ms_step:.1f} ms/step) ==")
    print(f"device op time {total_us/1e3/traced_steps:.1f} ms/step "
          f"({missed_us/1e3/traced_steps:.2f} ms unattributed)")
    print(f"\n{'section':<16}{'ms/step':>9}{'%':>7}{'fwd ms':>9}"
          f"{'bwd ms':>9}{'GB/step':>9}{'GB/s':>8}{'%HBMpk':>8}")
    for s, us in sorted(sec_us_m.items(), key=lambda kv: -kv[1]):
        ms = us / 1e3 / traced_steps
        fwd = sec_us.get(s + "[fwd]", 0) / 1e3 / traced_steps
        bwd = sec_us.get(s + "[bwd]", 0) / 1e3 / traced_steps
        gb = sec_bytes_m[s] / 1e9
        gbs = gb / (ms / 1e3) if ms > 0 else 0
        print(f"{s:<16}{ms:>9.2f}{100*us/max(total_us,1):>6.1f}%"
              f"{fwd:>9.2f}{bwd:>9.2f}{gb:>9.2f}{gbs:>8.0f}"
              f"{100*gbs/HBM_PEAK_GBS:>7.1f}%")

    # whole-program roofline from XLA cost analysis + measured time
    fl, byt = cost["flops"], cost["bytes"]
    tf = fl / (ms_step / 1e3) / 1e12
    gbs = byt / (ms_step / 1e3) / 1e9
    print(f"\n== roofline (XLA cost analysis / measured e2e) ==")
    print(f"flops/step {fl/1e9:.1f} G  bytes/step {byt/1e9:.2f} GB  "
          f"intensity {fl/max(byt,1):.0f} FLOP/B")
    print(f"achieved {tf:.1f} TFLOPS = {100*tf/BF16_PEAK_TFLOPS:.1f}% of "
          f"bf16 peak; {gbs:.0f} GB/s = {100*gbs/HBM_PEAK_GBS:.1f}% of "
          f"HBM peak ({HBM_PEAK_GBS:.0f} GB/s)")
    # per-fusion modeled bytes aggregate (the attribution's traffic model)
    model_gb = sum(sec_bytes_m.values()) / 1e9
    print(f"attribution traffic model total {model_gb:.2f} GB/step "
          f"(vs cost-analysis {byt/1e9:.2f})")


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    analyze_only = "--analyze" in argv
    if analyze_only:
        argv.remove("--analyze")
    dtype = "bf16"
    if "--dtype" in argv:
        i = argv.index("--dtype")
        dtype = argv[i + 1]
        del argv[i:i + 2]
    small = "--small" in argv
    if small:
        argv.remove("--small")
    best = "--best" in argv
    if best:
        argv.remove("--best")
    rng_impl = "rbg"
    if "--rng" in argv:
        i = argv.index("--rng")
        rng_impl = argv[i + 1]
        del argv[i:i + 2]
    B = int(argv[0]) if argv else 64
    tag = (f"{dtype}_b{B}{'_small' if small else ''}"
           f"{'_best' if best else ''}"
           f"{'' if rng_impl == 'rbg' else '_' + rng_impl}")
    logdir = f"/tmp/xprof_sections_{tag}"
    hlo_path = f"/tmp/hlo_sections_{tag}.txt.gz"
    if not analyze_only:
        build_and_measure(B, dtype, best, small, hlo_path, logdir,
                          rng_impl=rng_impl)
    analyze(hlo_path, logdir)

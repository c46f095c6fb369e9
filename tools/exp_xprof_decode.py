"""Device-level xprof breakdown of the CaSE predict step.

jax.profiler.trace DOES work through the relay-backed axon TPU (trace
stop takes ~3 min to ship the xplane back, but the trace contains a real
/device:TPU:0 lane with XLA Modules/Ops events) — measured 2026-08, round
4. This re-opens the decode-chain analysis docs/PERF.md round-2/3 closed
for lack of profiler visibility: instead of inferring the per-step cost
split from isolated microbenches, read the op-level device timeline of
the REAL full predict program.

Writes the trace under --logdir (default /tmp/xprof_decode) and prints an
aggregated per-op-category device-time table from the trace.json.gz.

Usage: python tools/exp_xprof_decode.py [B] [--model case] [--rank_only]
"""

import glob
import gzip
import json
import os
import random
import sys
import time
from collections import defaultdict

import numpy as np


def run_traced(B=64, model_name="case", rank_only=False,
               logdir="/tmp/xprof_decode", fast_argmax=None):
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from case_rg_tpu.config import DataConfig, ModelConfig
    from case_rg_tpu.data.featurize import featurize
    from case_rg_tpu.data.vocab import Vocabulary
    from case_rg_tpu.models import build_model_cfg, create_model
    from case_rg_tpu.runtime.inference import make_predict_fn
    from case_rg_tpu.train.precision import cast_params
    from exp_all_models_qps import synth_samples

    vocab = Vocabulary.load("/tmp/http_bench/prepared/vocab.txt")
    dcfg = DataConfig(query_len=60, passage_len=100, num_passage=10,
                      answer_len=40)
    base = ModelConfig(embedding_size=256, hidden_size=256, num_heads=8,
                       max_target_length=40, max_dec_len=40)
    mcfg = build_model_cfg(base, model_name, vocab)
    model = create_model(model_name, mcfg)
    rng = random.Random(0)
    print(f"devices={jax.devices()} B={B} model={model_name} "
          f"rank_only={rank_only}", flush=True)

    samples, query, passage = synth_samples(B, rng)
    arrays = featurize(model_name, samples, query, passage, vocab, {}, dcfg)
    init_batch = {k: jnp.asarray(v) for k, v in arrays.items() if k != "id"}
    if "passage_labels" in init_batch:
        init_batch["passage_label"] = init_batch.pop("passage_labels")[:, 0]
    init_batch["sample_weight"] = jnp.ones((B,), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           init_batch, method=type(model).train_losses))
    nrng = np.random.RandomState(0)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            nrng.standard_normal(s.shape).astype(np.float32) * 0.02), shapes)
    variables = cast_params(variables)
    predict = make_predict_fn(model, mcfg, max_len=40, rank_only=rank_only,
                              fast_argmax=fast_argmax)
    out_key = "rank" if rank_only else "answer"

    pred_keys = {"case": ("query", "passage"),
                 "masque": ("query", "passage"),
                 "tmemnet": ("context", "passage")}.get(
                     model_name, ("context", "background"))

    def fresh(i):
        s, q, p = synth_samples(B, random.Random(5000 + i))
        arr = featurize(model_name, s, q, p, vocab, {}, dcfg)
        return {k: jnp.asarray(arr[k]) for k in pred_keys}

    warm = fresh(99)
    t0 = time.time()
    np.asarray(predict(variables, warm)[out_key])
    print(f"compile+warm {time.time()-t0:.0f}s", flush=True)

    batches = [fresh(i) for i in range(2)]
    t0 = time.time()
    with jax.profiler.trace(logdir):
        for bt in batches:
            np.asarray(predict(variables, bt)[out_key])
    print(f"traced 2 iters + trace stop in {time.time()-t0:.0f}s", flush=True)


def _device_pid(events):
    """pid of the /device:TPU process in the chrome trace."""
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e.get("args", {}).get("name", "")):
                return e.get("pid")
    return None


def _tid_names(events, pid):
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("pid") == pid:
            names[e.get("tid")] = e.get("args", {}).get("name", "")
    return names


def category(op_name: str) -> str:
    """Bucket an XLA op name into a readable category."""
    n = op_name.lower()
    if "fusion" in n:
        return "fusion (elementwise/mixed)"
    for k in ("dot", "conv", "matmul", "dosort", "gemm"):
        if k in n:
            return "matmul"
    if "scatter" in n:
        return "scatter (copy dist)"
    if "dynamic-update" in n or "dynamic_update" in n:
        return "cache update"
    if "copy" in n:
        return "copy/layout"
    if "reduce" in n or "sort" in n or "arg" in n:
        return "reduce/sort/argmax"
    if "gather" in n or "slice" in n:
        return "gather/slice"
    if "transpose" in n or "reshape" in n or "bitcast" in n:
        return "transpose/reshape"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def analyze(logdir="/tmp/xprof_decode", top=30):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    pid = _device_pid(evs)
    tids = _tid_names(evs, pid)
    ops_tids = {t for t, n in tids.items() if n in ("XLA Ops",)}
    mod_tids = {t for t, n in tids.items() if n == "XLA Modules"}

    total_mod = sum(e.get("dur", 0) for e in evs
                    if e.get("ph") == "X" and e.get("pid") == pid
                    and e.get("tid") in mod_tids)
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    count = defaultdict(int)
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") != pid \
                or e.get("tid") not in ops_tids:
            continue
        dur = e.get("dur", 0)   # microseconds
        name = e.get("name", "?")
        by_cat[category(name)] += dur
        by_op[name] += dur
        count[name] += 1
    total_ops = sum(by_cat.values())
    print(f"\ntrace: {paths[-1]}")
    print(f"device module time {total_mod/1e3:.1f} ms, "
          f"sum of op time {total_ops/1e3:.1f} ms\n")
    print(f"{'category':<28}{'ms':>9}{'%':>7}")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{c:<28}{d/1e3:>9.2f}{100*d/max(total_ops,1):>6.1f}%")
    print(f"\ntop {top} ops by device time:")
    print(f"{'op':<58}{'ms':>8}{'n':>6}")
    for n, d in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{n[:57]:<58}{d/1e3:>8.2f}{count[n]:>6}")


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    rank_only = "--rank_only" in argv
    if rank_only:
        argv.remove("--rank_only")
    fast_argmax = True if "--fast_argmax" in argv else None  # None = auto
    if fast_argmax:
        argv.remove("--fast_argmax")
    if "--no_fast_argmax" in argv:
        fast_argmax = False
        argv.remove("--no_fast_argmax")
    bf16_scores = "--bf16_scores" in argv
    if bf16_scores:
        argv.remove("--bf16_scores")
    analyze_only = "--analyze" in argv
    if analyze_only:
        argv.remove("--analyze")
    model = "case"
    if "--model" in argv:
        i = argv.index("--model")
        model = argv[i + 1]
        del argv[i:i + 2]
    B = int(argv[0]) if argv else 64
    logdir = f"/tmp/xprof_decode_{model}" \
        f"{'_ro' if rank_only else ''}{'_fa' if fast_argmax else ''}" \
        f"{'_bs' if bf16_scores else ''}"
    if bf16_scores:
        import sys as _sys
        _sys.path.insert(0, "/root/repo")
        from case_rg_tpu.ops.attention import set_bf16_scores
        set_bf16_scores(True)
    if not analyze_only:
        run_traced(B, model, rank_only, logdir, fast_argmax)
    analyze(logdir)

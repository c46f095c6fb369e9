"""Per-model serving throughput: all six models at full CAsT scale.

bench.py tracks the flagship CaSE number; this measures the same pipelined
predict (greedy decode [+ rank where the model has a rank head], B=64
bfloat16, V=30522, d=256, CAsT shapes) for every model family so the
per-model inference paths all have a recorded number.

Batches come from the REAL featurizers (data/featurize.featurize over
synthetic word samples drawn from a 30522-token vocab), so shapes and key
sets are exactly what the CLI produces. Parameters are random normals
materialized from `jax.eval_shape` shapes (timing is data-independent).

Usage: python tools/exp_all_models_qps.py [--rank_only] [B] [iters] [model ...]

--rank_only times make_predict_fn(rank_only=True) (pool scores without the
sequential decode) for the rank-head models case/masque/tmemnet.

--argmax_modes dense,mxu,pallas sweeps the decode-argmax epilogue modes
within ONE process (same relay session — the only comparison this host's
±30% session variance permits; VERDICT r2 weak-4), re-building the predict
fn per mode over fresh batches.
"""

import os
import random
import sys
import time

import numpy as np

MODELS = ("case", "masque", "tmemnet", "glks", "gttp", "s2sa")


def synth_samples(n, rng, n_passages=10):
    words = [f"w{i:05d}" for i in range(20000)]
    query, passage = {}, {}
    samples = []
    for i in range(n):
        qid = f"q{i}"
        query[qid] = [rng.choice(words) for _ in range(8)] + ["?"]
        cid = f"q{i}_h0"
        query[cid] = [rng.choice(words) for _ in range(8)]
        pool = []
        for j in range(n_passages):
            pid = f"p{i}_{j}"
            passage[pid] = [rng.choice(words) for _ in range(90)] + ["."]
            pool.append(pid)
        samples.append({"query_id": qid, "context_id": [cid],
                        "passage_pool_id": pool, "passage_id": [pool[0]],
                        "answer": [rng.choice(words) for _ in range(12)]})
    return samples, query, passage


def _run_device_loop(name, model, variables, B, n_req, pred_keys, vocab,
                     dcfg, fast_argmax):
    """One model through the device-resident loop on the caps 4-40 mix
    (bench.py's exact driver path + knee config), warmup off the clock."""
    import time

    import jax
    import jax.numpy as jnp

    from case_rg_tpu.data.featurize import featurize
    from case_rg_tpu.runtime.continuous.device_loop import (
        make_device_loop_fns, run_continuous_device)

    max_len, cs, n_chunks, stage_rows = 40, 4, 8, 256
    refill = max(B // 4, 1)
    # master pool of featurized requests (one featurize pass, host-side)
    s, q, p = synth_samples(n_req, random.Random(31))
    arr = featurize(name, s, q, p, vocab, {}, dcfg)
    master = {k: arr[k] for k in pred_keys}
    caps_rng = np.random.RandomState(7)
    caps = caps_rng.randint(4, max_len + 1, size=n_req).astype(np.int32)

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        out = {k: jnp.asarray(v[idx]) for k, v in master.items()}
        out["response_cap"] = jnp.asarray(caps[idx])
        return out

    fns = make_device_loop_fns(model, max_len, chunk_steps=cs,
                               n_chunks=n_chunks, stage_rows=stage_rows,
                               refill_bound=refill,
                               fast_argmax=fast_argmax)
    reqs = [{"i": i} for i in range(n_req)]
    # warm the whole driver path off the clock (compiles all programs)
    t0 = time.time()
    warm = []
    run_continuous_device(iter(reqs[: 2 * B]), make_batch, fns, variables,
                          B, refill, emit=lambda r, ids, rk:
                          warm.append(r["i"]), max_len=max_len,
                          lookahead=True)
    compile_s = time.time() - t0
    assert len(warm) == 2 * B
    got = []
    t0 = time.time()
    stats = run_continuous_device(
        iter(reqs), make_batch, fns, variables, B, refill,
        emit=lambda r, ids, rk: got.append(r["i"]), max_len=max_len,
        lookahead=True)
    dt = time.time() - t0
    assert len(got) == n_req
    occ = stats["steps_served"] / max(stats["chunks"] * cs * B, 1)
    print(f"{name:>8}[dloop]: {n_req/dt:6.0f} qps  occupancy {occ:.2f}  "
          f"({stats['megas']} megas, {stats['chunks']} chunks; "
          f"caps mean {caps.mean():.1f}; compile+warm {compile_s:.0f}s)",
          flush=True)


def main():
    argv = list(sys.argv[1:])
    rank_only = "--rank_only" in argv
    if rank_only:
        argv.remove("--rank_only")
    fast_argmax = None  # auto
    if "--fast_argmax" in argv:  # bare flag = legacy pallas opt-in
        i = argv.index("--fast_argmax")
        argv.pop(i)
        if i < len(argv) and argv[i] in ("auto", "dense", "mxu", "pallas"):
            fast_argmax = {"auto": None, "dense": False}.get(
                argv[i], argv[i])
            argv.pop(i)
        else:
            fast_argmax = True
    if "--no_fast_argmax" in argv:
        fast_argmax = False
        argv.remove("--no_fast_argmax")
    argmax_modes = None
    if "--argmax_modes" in argv:
        i = argv.index("--argmax_modes")
        argmax_modes = [{"auto": None, "dense": False}.get(m, m)
                        for m in argv[i + 1].split(",")]
        del argv[i:i + 2]
    if "--no_fused_stack" in argv:
        from case_rg_tpu.models.multimem import set_fused_stack
        set_fused_stack(False)
        argv.remove("--no_fused_stack")
    if "--fused_stack" in argv:
        from case_rg_tpu.models.multimem import set_fused_stack
        set_fused_stack(True)
        argv.remove("--fused_stack")
    if "--bf16_scores" in argv:
        argv.remove("--bf16_scores")
        from case_rg_tpu.ops.attention import set_bf16_scores
        set_bf16_scores(True)
    b_sweep = None
    if "--b_sweep" in argv:   # serving batch-size knee: same-process sweep
        i = argv.index("--b_sweep")
        b_sweep = [int(x) for x in argv[i + 1].split(",")]
        del argv[i:i + 2]
    # --device_loop: measure the device-resident continuous loop (the
    # flagship serving mode) per model on a caps 4-40 mix instead of the
    # fixed-batch predict — VERDICT r4 item 8 (the continuous headline was
    # CaSE-only). Config = bench.py's round-14 knee: chunk=4 K=8 stage=256
    # refill=B/4 lookahead.
    device_loop = "--device_loop" in argv
    if device_loop:
        argv.remove("--device_loop")
    dl_n = 512
    if "--dl_n" in argv:
        i = argv.index("--dl_n")
        dl_n = int(argv[i + 1])
        del argv[i:i + 2]
    B = int(argv[0]) if len(argv) > 0 else 64
    iters = int(argv[1]) if len(argv) > 1 else 8
    models = argv[2:] or (("case", "masque", "tmemnet") if rank_only
                          else MODELS)
    bs = b_sweep or [B]

    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from case_rg_tpu.config import DataConfig, ModelConfig
    from case_rg_tpu.data.featurize import featurize
    from case_rg_tpu.data.vocab import Vocabulary
    from case_rg_tpu.models import build_model_cfg, create_model
    from case_rg_tpu.runtime.inference import make_predict_fn
    from case_rg_tpu.train.precision import cast_params

    vocab = Vocabulary.load("/tmp/http_bench/prepared/vocab.txt")
    dcfg = DataConfig(query_len=60, passage_len=100, num_passage=10,
                      answer_len=40)
    base = ModelConfig(embedding_size=256, hidden_size=256, num_heads=8,
                       max_target_length=40, max_dec_len=40)
    rng = random.Random(0)
    print(f"devices={jax.devices()} B={B} iters={iters}")

    for name in models:
      for B in bs:
        mcfg = build_model_cfg(base, name, vocab)
        model = create_model(name, mcfg)
        samples, query, passage = synth_samples(B, rng)
        arrays = featurize(name, samples, query, passage, vocab, {}, dcfg)
        init_batch = {k: jnp.asarray(v) for k, v in arrays.items()
                      if k != "id"}
        if "passage_labels" in init_batch:
            labels = init_batch.pop("passage_labels")
            init_batch["passage_label"] = labels[:, 0]
        init_batch["sample_weight"] = jnp.ones((B,), jnp.float32)

        shapes = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               init_batch,
                               method=type(model).train_losses))
        nrng = np.random.RandomState(0)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                nrng.standard_normal(s.shape).astype(np.float32) * 0.02),
            shapes)
        variables = cast_params(variables)
        out_key = "rank" if rank_only else "answer"

        pred_keys = {"case": ("query", "passage"),
                     "masque": ("query", "passage"),
                     "tmemnet": ("context", "passage"),
                     "glks": ("context", "background"),
                     "gttp": ("context", "background"),
                     "s2sa": ("context", "background")}[name]

        def fresh(i):
            s, q, p = synth_samples(B, random.Random(1000 + i))
            arr = featurize(name, s, q, p, vocab, {}, dcfg)
            return {k: jnp.asarray(arr[k]) for k in pred_keys}

        if device_loop:
            _run_device_loop(name, model, variables, B, dl_n, pred_keys,
                             vocab, dcfg, fast_argmax)
            continue

        for mi, mode in enumerate(argmax_modes or [fast_argmax]):
            predict = make_predict_fn(model, mcfg, max_len=40,
                                      rank_only=rank_only,
                                      fast_argmax=mode)
            tag = ("" if argmax_modes is None else
                   f"[{dict([(False, 'dense'), (None, 'auto'), (True, 'pallas')]).get(mode, mode)}]")
            # warm up on a batch that is NOT re-timed below: the relay
            # serves byte-identical calls from a cache (CLAUDE.md), which
            # would inflate qps by one near-free iteration
            warm = fresh(999_999 - mi)
            batches = [fresh(1000 * mi + i) for i in range(iters)]
            t0 = time.time()
            np.asarray(predict(variables, warm)[out_key])
            compile_s = time.time() - t0
            t0 = time.time()
            outs = [predict(variables, bt)[out_key] for bt in batches]
            for o in outs:
                np.asarray(o)
            dt = (time.time() - t0) / iters
            btag = f" B={B:<3d}" if len(bs) > 1 else ""
            print(f"{name:>8}{tag:>8}{btag}: {dt*1e3:7.1f} ms/batch  "
                  f"{B/dt:6.0f} qps  (compile {compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()

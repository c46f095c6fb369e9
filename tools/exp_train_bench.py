"""CaSE training throughput on the shipped trainer path (VERDICT r2
item 5: BENCH/BASELINE carried only inference numbers).

Measures ``Trainer.train_step`` — the exact jit'd program cli/run trains
with (donated state, fast-RNG dropout default, optax clip->adam->
schedule, EMA) — at CAsT shapes, reporting steps/s, samples/s,
target-tokens/s, and MFU from XLA's compiled cost analysis (v5e peak:
197 TFLOPS bf16 / 394 int8; f32 runs on the MXU as bf16 passes).

Timing is pipelined like the real epoch loop (train_epoch dispatches
steps back to back and only fetches losses every 100 steps): K steps
are dispatched with distinct per-step RNG and rolled batches, then one
scalar fetch syncs. Identical calls can be served from a relay cache
(CLAUDE.md), so every step gets distinct inputs.

Usage: python tools/exp_train_bench.py [K] [--b 16,64] [--dtypes f32,bf16]
           [--remat ,dots,nothing]   (sweep remat policies same-session)
"""

import sys
import time

import numpy as np


def main(argv):
    import os

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from case_rg_tpu.config import ModelConfig, TrainConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.train.trainer import Trainer

    K = int(argv[0]) if argv and not argv[0].startswith("-") else 16
    bs = [int(x) for x in (argv[argv.index("--b") + 1].split(",")
                           if "--b" in argv else ("16", "64"))]
    dtypes = (argv[argv.index("--dtypes") + 1].split(",")
              if "--dtypes" in argv else ["f32", "bf16"])
    remats = (argv[argv.index("--remat") + 1].split(",")
              if "--remat" in argv else [""])
    # sweep seeded-recompute dropout (ops/dropout.py) same-session:
    # --seeded 0,1 measures both; default off (the shipped default)
    seeded_modes = [int(x) for x in
                    (argv[argv.index("--seeded") + 1].split(",")
                     if "--seeded" in argv else ["0"])]
    # sweep bf16 attention scores (--scores 0,1): the round-13 copy-op
    # attribution put ~8 ms/step of f32 [640,8,100,100] score layout
    # copies + the score-shaped dropout/convert fusions on the table
    score_modes = [int(x) for x in
                   (argv[argv.index("--scores") + 1].split(",")
                    if "--scores" in argv else ["0"])]
    # scoped attention remat (--remat_attn 0,1): recompute scores/probs in
    # the backward pass instead of storing them (flash-attn memory trick)
    ra_modes = [int(x) for x in
                (argv[argv.index("--remat_attn") + 1].split(",")
                 if "--remat_attn" in argv else ["0"])]
    # fused training attention (--fta 0,1): kernels/train_attention.py
    fta_modes = [int(x) for x in
                 (argv[argv.index("--fta") + 1].split(",")
                  if "--fta" in argv else ["0"])]
    # in-kernel PRNG dropout for the fused training attention
    # (--ftar 0,1): masks drawn by the Mosaic PRNG inside the kernel,
    # regenerated in bwd — no HBM mask tensors (docs/PERF.md round 15)
    ftar_modes = [int(x) for x in
                  (argv[argv.index("--ftar") + 1].split(",")
                   if "--ftar" in argv else ["0"])]
    # head-batched wide-site layout (--hb 0,1): docs/PERF.md round 15
    hb_modes = [int(x) for x in
                (argv[argv.index("--hb") + 1].split(",")
                 if "--hb" in argv else ["1"])]
    # fused master-weight cast (--fcast 0,1): one big convert + slices
    # instead of ~200 per-leaf async copies (round-15 attribution)
    fc_modes = [int(x) for x in
                (argv[argv.index("--fcast") + 1].split(",")
                 if "--fcast" in argv else ["0"])]

    # RNG impl for dropout masks. cli/run ships rbg (--fast_rng default);
    # this tool historically never set it, so every docs/PERF.md train
    # number through round 14 was measured on the THREEFRY path (round-15
    # finding — the section attribution showed threefry mask-gen fusions
    # that the shipped config does not pay). Default now matches the cli;
    # --rng threefry restores the old measurement, --rng rbg,threefry
    # sweeps both in one process (same-session A/B).
    rng_impls = (argv[argv.index("--rng") + 1].split(",")
                 if "--rng" in argv else ["rbg"])

    small = "--small" in argv   # CPU correctness smoke, same code path
    v = 512 if small else 30522
    lq, lp, npass, la = (10, 12, 3, 8) if small else (60, 100, 10, 40)
    cfg = ModelConfig(name="case", vocab_size=v,
                      embedding_size=16 if small else 256,
                      hidden_size=16 if small else 256,
                      num_heads=2 if small else 8,
                      enc_layers=1 if small else 3,
                      dec_layers=1 if small else 4,
                      max_dec_len=la, max_target_length=la)
    model = create_model("case", cfg)
    print(f"devices={jax.devices()} K={K}")

    for b in bs:
        rng = np.random.RandomState(0)
        batch = {
            "query": jnp.asarray(rng.randint(4, v, size=(b, 1, lq)),
                                 jnp.int32),
            "passage": jnp.asarray(rng.randint(4, v, size=(b, npass, lp)),
                                   jnp.int32),
            "response": jnp.asarray(rng.randint(4, v, size=(b, la)),
                                    jnp.int32),
            "passage_label": jnp.zeros((b,), jnp.int32),
            "token_label": jnp.zeros((b, npass, lp), jnp.float32),
            "token_weight": jnp.ones((b, npass, lp), jnp.float32),
        }
        for dt in dtypes:
          for rm in remats:
           for rng_impl in rng_impls:
            jax.config.update("jax_default_prng_impl",
                              "rbg" if rng_impl == "rbg"
                              else "threefry2x32")
            for sd, sc, ra, ft, fr, hb, fc in [
                    (a, c, r, f, fr, hb, fc) for a in seeded_modes
                    for c in score_modes for r in ra_modes
                    for f in fta_modes for fr in ftar_modes
                    for hb in hb_modes for fc in fc_modes]:
             from case_rg_tpu.ops.attention import (
                set_bf16_scores, set_fused_train_attention,
                set_fused_train_attn_rng, set_fused_train_headbatch,
                set_remat_attend)
             from case_rg_tpu.ops.dropout import set_seeded_dropout
             from case_rg_tpu.train.precision import set_fused_cast
             set_seeded_dropout(bool(sd))
             set_bf16_scores(bool(sc))
             set_remat_attend(bool(ra))
             set_fused_train_attention(bool(ft))
             set_fused_train_attn_rng(bool(fr))
             set_fused_train_headbatch(bool(hb))
             set_fused_cast(fc)   # 0 per-leaf / 1 ravel / 2 grouped
             tc = TrainConfig(batch_size=b, learning_rate=2.5e-4,
                              warmup_steps=2000, remat=rm,
                              compute_dtype="bfloat16" if dt == "bf16"
                              else "float32")
             trainer = Trainer(model, tc, total_steps=10000)
             state = trainer.init_state(jax.random.PRNGKey(0), batch)
             key = jax.random.PRNGKey(7)

             def batches(i0, n):
                 # distinct inputs per step: roll the token axes
                 return [{k: (jnp.roll(x, i, axis=-1)
                              if x.dtype == jnp.int32 and x.ndim > 1 else x)
                          for k, x in batch.items()} for i in range(i0,
                                                                    i0 + n)]

             # compile + warmup (also builds trainer._train_step)
             key, sub = jax.random.split(key)
             t0 = time.time()
             state, losses = trainer.train_step(state, batch, sub)
             float(losses["total"])
             compile_s = time.time() - t0

             flops = None
             try:
                 ca = trainer._train_step.lower(
                     state, batch, sub).compile().cost_analysis()
                 if isinstance(ca, (list, tuple)):
                     ca = ca[0]
                 flops = float(ca.get("flops", 0.0)) or None
             except Exception:
                 pass

             reps = []
             for r in range(3):
                 bl = batches(100 * r + 1, K)
                 t0 = time.time()
                 for bt in bl:
                     key, sub = jax.random.split(key)
                     state, losses = trainer.train_step(state, bt, sub)
                 float(losses["total"])   # one sync for the whole window
                 reps.append(time.time() - t0)
             dt_s = float(np.median(reps)) / K
             tag = (f" rng={rng_impl}" if rng_impl != "rbg" else "") + \
                   (f" remat={rm}" if rm else "") + \
                   (" seeded_dropout" if sd else "") + \
                   (" bf16_scores" if sc else "") + \
                   (" remat_attn" if ra else "") + \
                   (" fta" if ft else "") + \
                   (" ftar" if fr else "") + \
                   ("" if hb else " nohb") + \
                   (f" fcast={fc}" if fc else "")
             line = (f"B={b:3d} {dt:>4}{tag}: {dt_s*1e3:7.1f} ms/step "
                     f"{1.0/dt_s:6.2f} steps/s {b/dt_s:7.0f} samples/s "
                     f"{b*40/dt_s:9.0f} tgt-tok/s")
             if flops:
                 tf = flops / dt_s / 1e12
                 line += f"  {tf:6.2f} TFLOPS ({tf/197*100:4.1f}% MFU)"
             line += f"  (compile {compile_s:.0f}s)"
             line += f"  loss {float(losses['total']):.3f}"
             assert np.isfinite(float(losses["total"]))
             print(line, flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

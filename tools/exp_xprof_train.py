"""Device-level xprof breakdown of the CaSE train step.

docs/PERF.md round 11 measured the shipped train step at 15-16% MFU,
flat across batch size and compute dtype (the bandwidth-bound signature)
and refuted remat as a lever; the named follow-up was "a per-op xprof
over the train step, as done for decode in round 4, would locate it".
This is that tool: trace ``Trainer.train_step`` (the exact donated-state
jit'd program cli/run trains with — train/trainer.py:184) through the
relay profiler and print the per-op-category device-time table via
exp_xprof_decode.analyze.

Usage: python tools/exp_xprof_train.py [B] [--dtype bf16|f32] [--analyze]
"""

import os
import sys
import time

import numpy as np


def run_traced(B=64, dtype="bf16", logdir="/tmp/xprof_train", small=False,
               best=False, rng_impl="rbg"):
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the host sitecustomize pins the axon TPU backend; the env var
        # alone does not override it (CLAUDE.md) — needed for --small
        jax.config.update("jax_platforms", "cpu")
    # match cli/run's shipped rbg default; rounds 12-14 traced threefry
    # by omission (--rng threefry reproduces those traces)
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
        # the shipped bf16-training fast path (cli/run.py auto gates):
        # bf16 attention scores + the fused training attention kernel
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
    key = jax.random.PRNGKey(7)

    def rolled(i):
        return {k: (jnp.roll(x, i, axis=-1)
                    if x.dtype == jnp.int32 and x.ndim > 1 else x)
                for k, x in batch.items()}

    key, sub = jax.random.split(key)
    t0 = time.time()
    state, losses = trainer.train_step(state, batch, sub)
    print(f"compile+warm {time.time()-t0:.0f}s "
          f"loss {float(losses['total']):.3f}", flush=True)

    t0 = time.time()
    with jax.profiler.trace(logdir):
        for i in range(2):
            key, sub = jax.random.split(key)
            state, losses = trainer.train_step(state, rolled(i + 1), sub)
            float(losses["total"])   # real host fetch per step (relay rules)
    print(f"traced 2 steps + trace stop in {time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_xprof_decode import analyze

    argv = list(sys.argv[1:])
    analyze_only = "--analyze" in argv
    if analyze_only:
        argv.remove("--analyze")
    dtype = "bf16"
    if "--dtype" in argv:
        i = argv.index("--dtype")
        dtype = argv[i + 1]
        del argv[i:i + 2]
    small = "--small" in argv   # CPU correctness smoke, same code path
    if small:
        argv.remove("--small")
    best = "--best" in argv     # bf16 scores + fused training attention
    if best:
        argv.remove("--best")
    rng_impl = "rbg"
    if "--rng" in argv:
        i = argv.index("--rng")
        rng_impl = argv[i + 1]
        del argv[i:i + 2]
    B = int(argv[0]) if argv else 64
    logdir = (f"/tmp/xprof_train_{dtype}_b{B}"
              f"{'_small' if small else ''}{'_best' if best else ''}"
              f"{'' if rng_impl == 'rbg' else '_' + rng_impl}")
    if not analyze_only:
        run_traced(B, dtype, logdir, small, best, rng_impl)
    analyze(logdir, top=40)

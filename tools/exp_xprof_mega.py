"""Per-op xprof of the device-loop MEGA program (boundary-cost hunt).

The round-13 floor decomposition (docs/PERF.md) estimates the in-jit
chunk boundary (harvest nonzero + log scatters + cond-gated ring refill)
at ~1-3 ms per chunk from A/B arithmetic — chunk=2 loses 21% to chunk=4
despite +5 points of occupancy. This traces ONE full-scale mega dispatch
(B=64, CaSE, caps workload shapes) and prints the per-op device table so
the boundary ops can be separated from the decode-chunk fusions by name.

Usage: python tools/exp_xprof_mega.py [B] [--chunk 4] [--k 8]
"""

import os
import sys
import time

import numpy as np


def main(argv):
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from case_rg_tpu.config import ModelConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.runtime.continuous.device_loop import \
        make_device_loop_fns
    from case_rg_tpu.train.precision import cast_params

    B = int(argv[0]) if argv and not argv[0].startswith("-") else 64
    cs = int(argv[argv.index("--chunk") + 1]) if "--chunk" in argv else 4
    K = int(argv[argv.index("--k") + 1]) if "--k" in argv else 8
    stage = int(argv[argv.index("--stage") + 1]) if "--stage" in argv \
        else 256
    v, max_len = 30522, 40
    cfg = ModelConfig(name="case", vocab_size=v, embedding_size=256,
                      hidden_size=256, num_heads=8, enc_layers=3,
                      dec_layers=4, max_dec_len=max_len,
                      max_target_length=max_len)
    model = create_model("case", cfg)
    rng = np.random.RandomState(0)
    n = stage + B
    master = {
        "query": rng.randint(4, v, size=(n, 1, 60)).astype(np.int32),
        "passage": rng.randint(4, v, size=(n, 10, 100)).astype(np.int32),
        "response_cap": rng.randint(4, max_len + 1, size=n).astype(np.int32),
    }
    ib = {k: jnp.asarray(x[:B]) for k, x in master.items() if k != "response_cap"}
    ib.update(response=jnp.asarray(rng.randint(4, v, (B, max_len)), jnp.int32),
              passage_label=jnp.zeros((B,), jnp.int32),
              token_label=jnp.zeros((B, 10, 100), jnp.float32),
              token_weight=jnp.ones((B, 10, 100), jnp.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, ib,
                           method=type(model).train_losses)
    variables = cast_params(variables)

    fns = make_device_loop_fns(model, max_len, chunk_steps=cs, n_chunks=K,
                               stage_rows=stage, refill_bound=B)

    def batch(lo, width):
        idx = np.arange(lo, lo + width) % n
        return {k: jnp.asarray(x[idx]) for k, x in master.items()}

    print(f"B={B} chunk={cs} K={K} stage={stage}; compiling...", flush=True)
    t0 = time.time()
    st, _ = fns.init_fn(variables, batch(0, B))
    uid = np.arange(B, dtype=np.int64)
    wrap = fns.wrap_fn(st, uid, uid >= 0)
    bkt, _ = fns.init_fn(variables, batch(B, B))
    stg = fns.stage_fn(bkt, jnp.arange(B, dtype=jnp.int32) + B)
    wrap, hv = fns.mega_fn(variables, wrap, stg, np.int32(stage))
    np.asarray(jax.device_get(hv["count"]))
    print(f"compiled+warm in {time.time()-t0:.0f}s", flush=True)

    # trace ONE mega with a full ring (so refills fire at boundaries)
    logdir = f"/tmp/xprof_mega_b{B}_c{cs}_k{K}"
    t0 = time.time()
    with jax.profiler.trace(logdir):
        wrap, hv = fns.mega_fn(variables, wrap, stg, np.int32(stage))
        np.asarray(jax.device_get(hv["count"]))
    print(f"traced 1 mega (+stop) in {time.time()-t0:.0f}s "
          f"chunks={int(np.asarray(jax.device_get(hv['chunks'])))}",
          flush=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_xprof_decode import analyze
    analyze(logdir, top=40)


if __name__ == "__main__":
    main(list(sys.argv[1:]))

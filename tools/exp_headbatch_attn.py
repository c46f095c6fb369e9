"""Head-batched train-attention layout: size the lever before a rework.

Round-14 named (and round-15 re-confirmed) the two 1280-wide block-0
tower sites as the top kernel cost: the merged-head lane-mask body
contracts the FULL E=1280 axis per head, i.e. H=8x the true attention
FLOPs (docs/PERF.md round 14; ~7.15 ms/step each in the round-15 bwd
trace). The proposed fix is a [R*H, L, d] layout with H folded into the
grid rows. This tool measures EXACTLY that alternative without a new
kernel: the existing ``fused_train_mha`` called with ``num_heads=1`` on
caller-side head-split operands IS the head-batched kernel (at H=1 the
lane mask is the identity and each row contracts only its own d lanes)
— including the caller-side split/merge transposes the real rework
would also pay.

Measures fwd+bwd (value_and_grad of sum) at the block-0 site shape
(R=640, L=100, E=1280, H=8) and the E=256 site shape, K iterations x 3
windows each, both variants in ONE process.

Usage: python tools/exp_headbatch_attn.py [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl", "rbg")

    from case_rg_tpu.kernels.train_attention import fused_train_mha

    K = int(argv[0]) if argv else 8
    rate = 0.1
    print(f"devices={jax.devices()} K={K}", flush=True)

    for (r, l, e, h) in [(640, 100, 1280, 8), (640, 100, 256, 8)]:
        d = e // h
        rng = np.random.RandomState(0)

        def inputs(i):
            rs = np.random.RandomState(100 + i)
            q = jnp.asarray(rs.standard_normal((r, l, e)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            k = jnp.asarray(rs.standard_normal((r, l, e)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            v = jnp.asarray(rs.standard_normal((r, l, e)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            mask = jnp.asarray(
                (rs.rand(r, h, l, l) > rate)).astype(jnp.bfloat16)
            return q, k, v, mask

        keepf = jnp.ones((r, 1, l), jnp.float32)
        keepf_hb = jnp.ones((r * h, 1, l), jnp.float32)

        # chain CH kernel calls inside ONE jit (feed ctx back as q) so
        # host dispatch (~25+ ms/call through the relay under load)
        # amortizes away and the per-call delta is measurable
        CH = 10

        def merged(q, k, v, mask):
            for _ in range(CH):
                q = fused_train_mha(q, k, v, keepf, mask, h, rate)
            return q.astype(jnp.float32).sum()

        def headbatched(q, k, v, mask):
            # caller-side split: [R, L, E] -> [R*H, L, d] (the transposes
            # the real rework would pay), mask [R, H, L, L] -> [R*H,1,L,L]
            def split(x):
                return (x.reshape(r, l, h, d).transpose(0, 2, 1, 3)
                        .reshape(r * h, l, d))
            def unsplit(x):
                return (x.reshape(r, h, l, d).transpose(0, 2, 1, 3)
                        .reshape(r, l, e))
            mhb = mask.reshape(r * h, 1, l, l)
            kk, vv = split(k), split(v)
            for _ in range(CH):
                ctx = fused_train_mha(split(q), kk, vv, keepf_hb,
                                      mhb, 1, rate)
                q = unsplit(ctx)
            return q.astype(jnp.float32).sum()

        for name, fn in (("merged-head H=8", merged),
                         ("head-batched H=1 x8", headbatched)):
            g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
            fwd = jax.jit(fn)
            # warm/compile
            q, k, v, m = inputs(0)
            jax.block_until_ready(fwd(q, k, v, m))
            jax.block_until_ready(g(q, k, v, m))
            batches = [inputs(1 + i) for i in range(K)]
            wins_f, wins_g = [], []
            for w in range(3):
                t0 = time.time()
                outs = [fwd(*bt) for bt in batches]
                for o in outs:
                    float(o)
                wins_f.append((time.time() - t0) / K * 1e3)
                t0 = time.time()
                outs = [g(*bt) for bt in batches]
                for o in outs:
                    jax.block_until_ready(o)
                wins_g.append((time.time() - t0) / K * 1e3)
            print(f"[{r}x{l} E={e}] {name:>20}: fwd "
                  f"{np.median(wins_f)/CH:6.2f} ms/call  fwd+bwd "
                  f"{np.median(wins_g)/CH:6.2f} ms/call "
                  f"(chain={CH}; windows "
                  f"{['%.2f' % x for x in wins_g]})", flush=True)
        # numerics: both formulations compute the same function
        q, k, v, m = inputs(99)
        a = jax.jit(merged)(q, k, v, m)
        b = jax.jit(headbatched)(q, k, v, m)
        print(f"  sum parity: merged {float(a):.1f} vs head-batched "
              f"{float(b):.1f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

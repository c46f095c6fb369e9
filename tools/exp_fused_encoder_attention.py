"""Fused (Pallas) encoder attention vs the XLA einsum path (round 5).

Checks, at the CaSE serving shapes, that kernels/encoder_attention.fused_mha
is (a) numerically identical to the einsum path on TPU and (b) faster per
attention site (the einsum path materializes + layout-converts the f32
[R,H,L,L] score tensor in HBM — xprof round 4).

Methodology per docs/PERF.md: relay-roundtrip calibration, K-iteration
in-jit scan loops with an input perturbation per step, scalar fetch, nop
subtraction.

Usage: python tools/exp_fused_encoder_attention.py [iters]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from case_rg_tpu.kernels.encoder_attention import fused_mha, fused_mha_xla

DT = jnp.bfloat16
H = 8


def calibrate():
    nop = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), DT)
    np.asarray(nop(x))
    times = []
    for r in range(7):
        t0 = time.time()
        np.asarray(nop(x + jnp.asarray(r * 0.1, DT)))
        times.append(time.time() - t0)
    rt = float(np.median(times))
    print(f"relay roundtrip: {rt*1e3:.1f} ms")
    return rt


def run(name, make_loop, x0, iters, roundtrip, nop_us=0.0):
    try:
        loop = make_loop()
        out = np.asarray(loop(x0), np.float32)
    except Exception as e:
        print(f"{name:>12}: FAILED {type(e).__name__}: {e}")
        return None
    times = []
    for r in range(5):
        t0 = time.time()
        np.asarray(loop(x0 * jnp.asarray(1 + 0.01 * (r + 1), DT)))
        times.append(time.time() - t0)
    us = (float(np.median(times)) - roundtrip) / iters * 1e6 - nop_us
    print(f"{name:>12}: {us:8.1f} us/site  (checksum {out.sum():+.3e})")
    return us


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"devices={jax.devices()} iters={iters}")
    roundtrip = calibrate()
    rng = np.random.RandomState(0)

    for (r, lq, lk, e) in [(640, 100, 100, 256), (64, 60, 60, 256),
                           (640, 100, 100, 1280)]:
        print(f"\n== rows={r} Lq={lq} Lk={lk} E={e} H={H} ==")
        q0 = jnp.asarray(rng.standard_normal((r, lq, e)), DT)
        k = jnp.asarray(rng.standard_normal((r, lk, e)), DT)
        v = jnp.asarray(rng.standard_normal((r, lk, e)), DT)
        valid = rng.randint(lk // 2, lk + 1, size=(r,))
        keep = jnp.asarray(np.arange(lk)[None, :] < valid[:, None])

        ref = np.asarray(fused_mha_xla(q0, k, v, keep, H), np.float32)
        out = np.asarray(fused_mha(q0, k, v, keep, H), np.float32)
        nd = np.abs(ref - out)
        print(f"max|diff| fused vs einsum: {nd.max():.6f} "
              f"(bitwise-identical: {bool((nd == 0).all())}; "
              f"ref max {np.abs(ref).max():.2f})")

        def scan_loop(body):
            @jax.jit
            def loop(x0):
                def step(x, _):
                    out = body(x)
                    return x * (jnp.asarray(1.0, DT) + jnp.asarray(1e-6, DT)
                                * out[:, :1, :1]), ()
                x, _ = jax.lax.scan(step, x0, jnp.arange(iters))
                return jnp.sum(x.astype(jnp.float32))
            return loop

        nop_us = run("nop", lambda: scan_loop(lambda x: x[:, :1, :1] * 2),
                     q0, iters, roundtrip)
        run("einsum", lambda: scan_loop(
            lambda x: fused_mha_xla(x, k, v, keep, H)),
            q0, iters, roundtrip, nop_us)
        run("fused", lambda: scan_loop(lambda x: fused_mha(x, k, v, keep, H)),
            q0, iters, roundtrip, nop_us)


if __name__ == "__main__":
    main()

"""Probe: fused decoder-stack decode step (kernels/decoder_stack.py).

Validates the folded-projection Pallas stack kernel against the real
``ops.transformer.Decoder.step`` chain (the per-step decode limiter —
docs/PERF.md "decode step cost split"), then times both on the TPU with
the K-iteration in-jit method (CLAUDE.md relay-timing rules).

Modes:
  check   — interpret-mode numerics vs the XLA chain (any backend):
            f32 strict-ish, bf16 loose. Run on CPU first.
  time    — TPU: us/step for the XLA chain vs the fused kernel at
            CaSE serving shapes (B=64, L=1000 passage stack and L=60
            query stack), sweeping rows_per_block.

Usage: python tools/exp_fused_stack.py check|time [B] [L] [iters]
"""

import functools
import os
import sys
import time

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # CLAUDE.md env quirk: the host sitecustomize pins the axon TPU
    # backend; forcing CPU needs the config call too, pre-backend-init
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, ".")

from case_rg_tpu.ops.transformer import Decoder  # noqa: E402
from case_rg_tpu.kernels import decoder_stack as ds  # noqa: E402

E, H, NL, T = 256, 8, 4, 40


def build(key, b, l, dtype):
    dec = Decoder(NL, E, H, d_ff=E, dropout=0.0, activation="gelu")
    kx, km, kp = jax.random.split(key, 3)
    m = jax.random.normal(km, (b, l, E), jnp.float32)
    x = jax.random.normal(kx, (b, 1, E), jnp.float32)
    params = dec.init(kp, x, m, None, None, deterministic=True)["params"]
    cast = lambda t_: jax.tree.map(lambda a: a.astype(dtype), t_)
    params, m, x = cast(params), m.astype(dtype), x.astype(dtype)
    mem_keep = jax.random.uniform(km, (b, l)) > 0.1
    return dec, params, x, m, mem_keep


def xla_step(dec, params, x, t, caches, cross, hist, mem_keep):
    return dec.apply({"params": params}, x, t, caches, cross, hist,
                     mem_keep, method=Decoder.step)


def run_check(b=8, l=96):
    for dtype, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 3e-2)):
        dec, params, x, m, mem_keep = build(jax.random.PRNGKey(0), b, l,
                                            dtype)
        cross = dec.apply({"params": params}, m,
                          method=Decoder.precompute_memory)
        caches = dec.apply({"params": params}, b, T, dtype,
                           method=Decoder.init_cache)
        folded = ds.fold_stack_weights(params, NL, H, dtype)
        cstack = jnp.stack(caches, axis=1)
        hist = jnp.zeros((b, T), bool)
        xc = xk = x
        worst = 0.0
        for t in range(4):
            hist = hist.at[:, t].set(True)
            y_ref, caches = xla_step(dec, params, xc, jnp.int32(t), caches,
                                     cross, hist, mem_keep)
            y_k, cstack = ds.stack_step(xk[:, 0], jnp.int32(t), cstack, m,
                                        mem_keep, hist, folded, H,
                                        rows_per_block=4, interpret=True)
            diff = float(jnp.max(jnp.abs(y_ref[:, 0].astype(jnp.float32)
                                         - y_k.astype(jnp.float32))))
            scale_ = float(jnp.max(jnp.abs(y_ref))) or 1.0
            worst = max(worst, diff / scale_)
            print(f"  {np.dtype(dtype).name} t={t}: max|d|={diff:.3e} "
                  f"rel={diff / scale_:.3e}", flush=True)
            # feed each path its own output (accumulates its own rounding)
            xc, xk = y_ref, y_k[:, None, :]
        cd = float(jnp.max(jnp.abs(
            jnp.stack(caches, axis=1).astype(jnp.float32)
            - cstack.astype(jnp.float32))))
        print(f"  {np.dtype(dtype).name}: cache max|d|={cd:.3e} "
              f"worst rel={worst:.3e} tol={tol}", flush=True)
        assert worst < tol, f"{np.dtype(dtype).name} mismatch: {worst}"
    print("CHECK OK", flush=True)


def calibrate():
    nop = jax.jit(lambda v: v + 1)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(nop(z))
    ts = []
    for r in range(7):
        t0 = time.time()
        np.asarray(nop(z + r * 0.1))
        ts.append(time.time() - t0)
    rt = float(np.median(ts))
    print(f"relay roundtrip: {rt * 1e3:.1f} ms", flush=True)
    return rt


def timeit(name, fn, args, iters, rt, sub=0.0):
    f = jax.jit(functools.partial(fn, iters=iters))
    try:
        np.asarray(jax.tree.leaves(f(*args))[0])  # compile
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        el = (time.time() - t0 - rt) / iters * 1e6 - sub
        print(f"  {name:>28s}: {el:8.1f} us/step", flush=True)
        return el
    except Exception as ex:  # noqa: BLE001
        print(f"  {name:>28s}: FAIL {type(ex).__name__}: "
              f"{str(ex)[:500]}", flush=True)
        return None


def run_time(b=64, l=1000, iters=200):
    dtype = jnp.bfloat16
    dec, params, x, m, mem_keep = build(jax.random.PRNGKey(0), b, l, dtype)
    cross = dec.apply({"params": params}, m, method=Decoder.precompute_memory)
    caches = dec.apply({"params": params}, b, T, dtype,
                       method=Decoder.init_cache)
    folded = ds.fold_stack_weights(params, NL, H, dtype)
    cstack = jnp.stack(caches, axis=1)
    hist = jnp.ones((b, T), bool)
    print(f"devices={jax.devices()} B={b} L={l} iters={iters}", flush=True)
    rt = calibrate()

    def scan_nop(x0, iters):
        def body(c, t):
            return jnp.tanh(c), ()
        return jax.lax.scan(body, x0, jnp.arange(iters))[0]

    nop = timeit("scan-nop", scan_nop, (x[:, 0],), iters, rt) or 0.0

    def loop_xla(x0, caches, iters):
        def body(c, t):
            xc, cs = c
            y, cs = xla_step(dec, params, xc, t % T, cs, cross, hist,
                             mem_keep)
            return (jnp.tanh(y), cs), ()
        return jax.lax.scan(body, (x0, caches), jnp.arange(iters))[0]

    timeit("xla chain (ref)", loop_xla, (x, caches), iters, rt, nop)

    for rb, lc in ((8, 1), (8, 2), (16, 2), (8, 4)):
        def loop_fused(x0, cs, iters, rb=rb, lc=lc):
            def body(c, t):
                xc, cs = c
                y, cs = ds.stack_step(xc, t % T, cs, m, mem_keep, hist,
                                      folded, H, rows_per_block=rb,
                                      layers_per_call=lc, interpret=False)
                return (jnp.tanh(y), cs), ()
            return jax.lax.scan(body, (x0, cs), jnp.arange(iters))[0]

        timeit(f"fused stack rb={rb} lc={lc}", loop_fused,
               (x[:, 0], cstack), iters, rt, nop)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        run_check()
    else:
        b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        l = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
        it = int(sys.argv[4]) if len(sys.argv) > 4 else 200
        run_time(b, l, it)

"""Tuning probe for the copy-argmax combine kernel (round-2 regression).

Round-6 recorded combine_copy_mass at 47-92 us/step (B=64 Ls=1060); a
fresh xprof this round shows the SAME kernel at ~717 us/step in the real
predict program, flipping the auto fast_argmax gate from a +12% win to a
-15% regression vs the dense scatter (750 vs 634 qps e2e). This probe
sweeps kernel configurations in one process to find what the current
backend lowers well: block sizes (rb x JT x LT), where/multiply bodies,
grid order, and an MXU (dot) formulation of the compare+MAC.

Method: K-iteration in-jit scan loops with a carry data dependency
(CLAUDE.md relay-timing rules), relay roundtrip + scan overhead
subtracted.

Usage: python tools/exp_copyargmax_tune.py [B] [Ls] [iters]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def calibrate():
    nop = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(nop(x))
    times = []
    for r in range(7):
        t0 = time.time()
        np.asarray(nop(x + r * 0.1))
        times.append(time.time() - t0)
    rt = float(np.median(times))
    print(f"relay roundtrip: {rt*1e3:.1f} ms", flush=True)
    return rt


def make_kernel(rb, jt, lt, body, grid_order="bj"):
    """combine(cw [B,Lp] f32, ids [B,Lp] i32) -> [B,Lp] f32 with the given
    block config. Lp must divide by jt and lt."""

    def kern(ids_ref, idj_ref, cw_ref, out_ref):
        ids = ids_ref[...]
        cw = cw_ref[...]
        idj = idj_ref[...]
        lp = ids.shape[1]
        acc = jnp.zeros((rb, jt), jnp.float32)
        for k in range(lp // lt):
            idl = jax.lax.slice_in_dim(ids, k * lt, (k + 1) * lt, axis=1)
            cwl = jax.lax.slice_in_dim(cw, k * lt, (k + 1) * lt, axis=1)
            eq = idl[:, :, None] == idj[:, None, :]
            if body == "where":
                acc = acc + jnp.sum(jnp.where(eq, cwl[:, :, None], 0.0),
                                    axis=1)
            elif body == "mul":
                acc = acc + jnp.sum(eq.astype(jnp.float32)
                                    * cwl[:, :, None], axis=1)
            elif body in ("dot", "doth"):
                # MXU: per row-block, comb[r, j] += cw[r, :] @ eq[r, :, :]
                # batched over rb. "doth" = Precision.HIGHEST so the f32
                # cw operand is not rounded to bf16 by the default single
                # MXU pass (argmax-tie exactness vs the dense f32 path)
                prec = (jax.lax.Precision.HIGHEST if body == "doth"
                        else None)
                acc = acc + jax.lax.dot_general(
                    cwl[:, None, :], eq.astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    precision=prec,
                    preferred_element_type=jnp.float32)[:, 0, :]
        out_ref[...] = acc

    def combine(cw, ids, b, lp):
        if grid_order == "bj":
            grid = (b // rb, lp // jt)
            bspec = lambda i, j: (i, 0)
            jspec = lambda i, j: (i, j)
        else:
            grid = (lp // jt, b // rb)
            bspec = lambda j, i: (i, 0)
            jspec = lambda j, i: (i, j)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, lp), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((rb, lp), bspec),
                      pl.BlockSpec((rb, jt), jspec),
                      pl.BlockSpec((rb, lp), bspec)],
            out_specs=pl.BlockSpec((rb, jt), jspec),
        )(ids, ids, cw)

    return combine


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    Ls = int(sys.argv[2]) if len(sys.argv) > 2 else 1060
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    print(f"devices={jax.devices()} B={B} Ls={Ls} iters={iters}", flush=True)

    rng = np.random.default_rng(0)
    ids_np = rng.integers(4, 30522, size=(B, Ls), dtype=np.int32)
    cw_np = rng.random((B, Ls), np.float32)

    rt = calibrate()

    def scan_loop(fn):
        @jax.jit
        def loop(w):
            def body(carry, _):
                comb = fn(carry)
                # consume comb the way the real decode step does — argmax
                # over j plus the value at the argmax. (A sum consumer lets
                # XLA collapse the dense variant into one double reduce
                # that never materializes comb per-j; a single-column slice
                # lets it slice-fuse — both understate the real cost.)
                pos = jnp.argmax(comb, axis=1)
                val = jnp.take_along_axis(comb, pos[:, None], 1)[:, 0]
                return carry + (val * 1e-9 + pos * 1e-12)[:, None], ()
            out, _ = jax.lax.scan(body, w, None, length=iters)
            return out[:, 0]
        return loop

    # scan overhead baseline
    nop_loop = scan_loop(lambda w: w)
    np.asarray(nop_loop(jnp.asarray(cw_np)))
    t0 = time.time()
    np.asarray(nop_loop(jnp.asarray(cw_np * 1.01)))
    nop_us = (time.time() - t0 - rt) / iters * 1e6
    print(f"scan-nop: {nop_us:.1f} us/step", flush=True)

    results = {}

    def measure(name, fn, pad_lp):
        idp = jnp.asarray(np.pad(ids_np, ((0, 0), (0, pad_lp - Ls)),
                                 constant_values=-1))
        cwp0 = np.pad(cw_np, ((0, 0), (0, pad_lp - Ls)))
        loop = scan_loop(lambda w: fn(w, idp, B, pad_lp))
        try:
            out = np.asarray(loop(jnp.asarray(cwp0)))
        except Exception as e:
            print(f"{name:>28}: FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
            return
        times = []
        for r in range(5):
            t0 = time.time()
            np.asarray(loop(jnp.asarray(cwp0 * (1 + 0.01 * (r + 1)))))
            times.append(time.time() - t0)
        us = (float(np.median(times)) - rt) / iters * 1e6 - nop_us
        results[name] = us
        print(f"{name:>28}: {us:7.1f} us/step (chk {out.sum():+.3e})",
              flush=True)

    # current shipped config
    from case_rg_tpu.kernels.copy_argmax import combine_copy_mass
    measure("shipped(rb8,jt128,lt128)",
            lambda w, ids, b, lp: combine_copy_mass(w[:, :Ls], ids[:, :Ls]),
            ((Ls + 127) // 128) * 128)

    # XLA dense compare (reference formulation, for scale)
    def xla_dense(w, ids, b, lp):
        eq = ids[:, :, None] == ids[:, None, :]
        return jnp.sum(jnp.where(eq, w[:, :, None], 0.0), axis=1)
    measure("xla_dense", xla_dense, ((Ls + 127) // 128) * 128)

    lp128 = ((Ls + 127) // 128) * 128
    configs = [(8, 128, 128, "where"), (8, 128, 128, "mul"),
               (8, 128, 128, "dot"), (16, 128, 128, "where"),
               (16, 128, 128, "mul"), (16, 128, 128, "dot"),
               (32, 128, 128, "dot")]
    if len(sys.argv) > 4:   # e.g. "8:128:128:doth,8:384:384:doth"
        configs = [tuple(int(x) if x.isdigit() else x
                         for x in c.split(":"))
                   for c in sys.argv[4].split(",")]
    for rb, jt, lt, body in configs:
        if lp128 % jt or lp128 % lt:
            continue
        name = f"rb{rb},jt{jt},lt{lt},{body}"
        k = make_kernel(rb, jt, lt, body)
        measure(name, lambda w, ids, b, lp, k=k: k(w, ids, b, lp), lp128)

    if results:
        best = min(results, key=results.get)
        print(f"\nBEST: {best} at {results[best]:.1f} us/step", flush=True)


if __name__ == "__main__":
    main()

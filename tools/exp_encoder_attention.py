"""Encoder/tower self-attention variants (xprof round-4 follow-up #2).

The default-program trace (tools/exp_xprof_decode.py) shows ~22 ms/batch
(~19%) of the CaSE predict in copy/layout ops, mostly f32[640,8,100,100]
attention-score layout conversions around the encoder/tower self-attention
dot_generals (one per layer; 205 MB each). Variants:

  einsum_f32  current path (ops/attention.attend: f32 scores, f32 softmax)
  einsum_bf16 scores stay bf16 (accuracy measured vs f32)
  flash       jax.experimental.pallas.ops.tpu.flash_attention with
              segment-id padding masks (never materializes the score
              tensor in HBM)

Shapes are the CaSE passage-encoder hot case: B*P=640 rows, H=8, L=100,
d=32, bf16 inputs, trailing key padding.

Usage: python tools/exp_encoder_attention.py [rows] [L] [iters]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, D = 8, 32
DT = jnp.bfloat16


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


def einsum_attn(q, k, v, keep, score_dtype):
    scale = jnp.asarray(1.0 / np.sqrt(D), q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=score_dtype)
    scores = jnp.where(keep[:, None, None, :], scores,
                       jnp.asarray(-1e30, scores.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def flash_attn(q, k, v, seg, L):
    # pad L up to the kernel's 128 block; padded keys get segment id 0
    # (valid tokens are 1), padded query rows are sliced away after
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    pad = (-L) % 128
    if pad:
        zq = jnp.zeros(q.shape[:2] + (pad, q.shape[3]), q.dtype)
        q = jnp.concatenate([q, zq], axis=2)
        k = jnp.concatenate([k, zq], axis=2)
        v = jnp.concatenate([v, zq], axis=2)
        seg = jnp.concatenate(
            [seg, jnp.zeros((seg.shape[0], pad), seg.dtype)], axis=1)
    out = flash_attention(q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                          sm_scale=float(1.0 / np.sqrt(D)))
    return out[:, :, :L]


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
    print(f"{name:>12}: {us:8.1f} us/layer-attn  (checksum {out.sum():+.3e})")
    return us


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    print(f"devices={jax.devices()} rows={rows} H={H} L={L} d={D} "
          f"iters={iters}")
    roundtrip = calibrate()

    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.standard_normal((rows, H, L, D)), DT)
    k = jnp.asarray(rng.standard_normal((rows, H, L, D)), DT)
    v = jnp.asarray(rng.standard_normal((rows, H, L, D)), DT)
    # trailing padding like featurized passages (varied per row)
    valid = rng.randint(L // 2, L + 1, size=(rows,))
    keep = jnp.asarray(np.arange(L)[None, :] < valid[:, None])
    seg = jnp.asarray(np.where(np.asarray(keep), 1, 0), jnp.int32)

    # accuracy: bf16 scores and flash vs the f32-score reference
    ref = np.asarray(einsum_attn(q0, k, v, keep, jnp.float32), np.float32)
    alt = np.asarray(einsum_attn(q0, k, v, keep, DT), np.float32)
    print(f"bf16-score max|diff| vs f32-score: {np.abs(ref - alt).max():.5f} "
          f"(ref max {np.abs(ref).max():.3f})")
    try:
        fl = np.asarray(flash_attn(q0, k, v, seg, L), np.float32)
        print(f"flash      max|diff| vs f32-score: {np.abs(ref - fl).max():.5f}")
    except Exception as e:
        print(f"flash correctness check failed: {type(e).__name__}: {e}")

    def scan_loop(body):
        @jax.jit
        def loop(x0):
            def step(x, _):
                out = body(x)
                return x * (jnp.asarray(1.0, DT) + jnp.asarray(1e-6, DT)
                            * out[:, :1, :1, :1]), ()
            x, _ = jax.lax.scan(step, x0, jnp.arange(iters))
            # return a SCALAR: fetching the full tensor through the relay
            # costs seconds and would swamp the measurement
            return jnp.sum(x.astype(jnp.float32))
        return loop

    nop_us = run("nop", lambda: scan_loop(lambda x: x[:, :1, :1, :1] * 2),
                 q0, iters, roundtrip)
    run("einsum_f32", lambda: scan_loop(
        lambda x: einsum_attn(x, k, v, keep, jnp.float32)),
        q0, iters, roundtrip, nop_us)
    run("einsum_bf16", lambda: scan_loop(
        lambda x: einsum_attn(x, k, v, keep, DT)),
        q0, iters, roundtrip, nop_us)
    run("flash", lambda: scan_loop(lambda x: flash_attn(x, k, v, seg, L)),
        q0, iters, roundtrip, nop_us)


def einsum_attn_kq(q, k, v, keep, score_dtype):
    """Transposed score layout: softmax over axis -2, PV contracts k."""
    scale = jnp.asarray(1.0 / np.sqrt(D), q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhkq", q * scale, k,
                        preferred_element_type=score_dtype)
    scores = jnp.where(keep[:, None, :, None], scores,
                       jnp.asarray(-1e30, scores.dtype))
    probs = jax.nn.softmax(scores, axis=-2)
    return jnp.einsum("bhkq,bhkd->bhqd", probs.astype(v.dtype), v)


def einsum_attn_flat(q, k, v, keep, score_dtype):
    """Merge batch x heads into one leading dim (3-D dots)."""
    b, h, l, d = q.shape
    scale = jnp.asarray(1.0 / np.sqrt(D), q.dtype)
    q2 = (q * scale).reshape(b * h, l, d)
    k2 = k.reshape(b * h, -1, d)
    v2 = v.reshape(b * h, -1, d)
    scores = jnp.einsum("zqd,zkd->zqk", q2, k2,
                        preferred_element_type=score_dtype)
    keep2 = jnp.repeat(keep, h, axis=0)
    scores = jnp.where(keep2[:, None, :], scores,
                       jnp.asarray(-1e30, scores.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("zqk,zkd->zqd", probs.astype(v2.dtype),
                      v2).reshape(b, h, l, d)


def main2():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    print(f"variants-2: rows={rows} L={L} iters={iters}")
    roundtrip = calibrate()
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.standard_normal((rows, H, L, D)), DT)
    k = jnp.asarray(rng.standard_normal((rows, H, L, D)), DT)
    v = jnp.asarray(rng.standard_normal((rows, H, L, D)), DT)
    valid = rng.randint(L // 2, L + 1, size=(rows,))
    keep = jnp.asarray(np.arange(L)[None, :] < valid[:, None])
    ref = np.asarray(einsum_attn(q0, k, v, keep, jnp.float32), np.float32)
    for nm, fn in (("kq", einsum_attn_kq), ("flat", einsum_attn_flat)):
        alt = np.asarray(fn(q0, k, v, keep, jnp.float32), np.float32)
        print(f"{nm} max|diff| vs base f32: {np.abs(ref - alt).max():.6f}")

    def scan_loop(body):
        @jax.jit
        def loop(x0):
            def step(x, _):
                out = body(x)
                return x * (jnp.asarray(1.0, DT) + jnp.asarray(1e-6, DT)
                            * out[:, :1, :1, :1]), ()
            x, _ = jax.lax.scan(step, x0, jnp.arange(iters))
            return jnp.sum(x.astype(jnp.float32))
        return loop

    nop_us = run("nop", lambda: scan_loop(lambda x: x[:, :1, :1, :1] * 2),
                 q0, iters, roundtrip)
    run("base_f32", lambda: scan_loop(
        lambda x: einsum_attn(x, k, v, keep, jnp.float32)),
        q0, iters, roundtrip, nop_us)
    run("kq_f32", lambda: scan_loop(
        lambda x: einsum_attn_kq(x, k, v, keep, jnp.float32)),
        q0, iters, roundtrip, nop_us)
    run("flat_f32", lambda: scan_loop(
        lambda x: einsum_attn_flat(x, k, v, keep, jnp.float32)),
        q0, iters, roundtrip, nop_us)
    run("kq_bf16", lambda: scan_loop(
        lambda x: einsum_attn_kq(x, k, v, keep, DT)),
        q0, iters, roundtrip, nop_us)


if __name__ == "__main__":
    import sys as _s
    (main2 if "--v2" in _s.argv else main)()

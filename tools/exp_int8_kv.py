"""int8-quantized cross-KV decode attention experiment.

docs/PERF.md establishes that the decode chain's dominant cost is streaming
the cross-attention K/V memories ([B, L, E] bf16, fixed per sequence) at the
backend's ~330-400 GB/s single-stream ceiling. If the stream is truly
bandwidth-bound, halving the bytes (int8 storage) should halve the time.

Quantization is symmetric per-(batch, channel): K/V are stored int8 with
f32 scales of shape [B, 1, E]. Both scales fold into the surrounding math
exactly (no dequantized [B, L, E] tensor is ever materialized):

    scores = (q * kscale / sqrt(d)) . K_i8        (scale rides the query)
    ctx    = (probs . V_i8) * vscale              (scale rides the output)

so the only extra traffic is the [B, E] scale vectors. Accuracy is a
separate question (int8 ~ 2-3 decimal digits); measured here as max/mean
error vs the bf16 path, and gated end-to-end by metric parity before any
default flips.

Usage: python tools/exp_int8_kv.py [B] [L] [iters]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

E, H = 256, 8
D = E // H
DT = jnp.bfloat16


def bf16_attn(q, k, v):
    """Current path (ops/attention.attend_with_kv_merged math)."""
    b = q.shape[0]
    qh = q.reshape(b, 1, H, D)
    kh = k.reshape(b, -1, H, D)
    vh = v.reshape(b, -1, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh * jnp.asarray(1 / np.sqrt(D), q.dtype),
                   kh, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, -1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, 1, E)


def quantize(x, axis=1):
    """Symmetric per-(batch, channel) int8: x ~ x_i8 * scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xi.astype(jnp.int8), scale.astype(jnp.float32)


def int8_attn(q, k_i8, kscale, v_i8, vscale):
    """Same math with int8 K/V; scales folded into q / the context."""
    b = q.shape[0]
    qs = (q.astype(jnp.float32) * kscale * (1 / np.sqrt(D))).astype(DT)
    qh = qs.reshape(b, 1, H, D)
    kh = k_i8.reshape(b, -1, H, D)
    vh = v_i8.reshape(b, -1, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh.astype(DT),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, -1).astype(DT)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, vh.astype(DT)).reshape(b, 1, E)
    return (ctx.astype(jnp.float32) * vscale).astype(DT)


def calibrate(B):
    """Fixed per-call relay roundtrip (subtracted from loop timings)."""
    @jax.jit
    def nop(x):
        return x + jnp.asarray(1.0, x.dtype)
    x = jax.random.normal(jax.random.PRNGKey(9), (B, 1, E), DT)
    np.asarray(nop(x))
    times = []
    for r in range(7):
        t0 = time.time()
        np.asarray(nop(x + jnp.asarray(r * 0.1, DT)))
        times.append(time.time() - t0)
    rt = float(np.median(times))
    print(f"relay roundtrip (trivial call): {rt*1e3:.1f} ms")
    return rt


def run(name, loop_maker, nbytes, B, L, iters, roundtrip):
    loop, q0 = loop_maker()
    out = np.asarray(loop(q0))
    times = []
    for r in range(5):
        t0 = time.time()
        np.asarray(loop(q0 + jnp.asarray(0.01 * (r + 1), DT)))
        times.append(time.time() - t0)
    us = (float(np.median(times)) - roundtrip) / iters * 1e6
    gbs = nbytes / (us * 1e-6) / 1e9
    print(f"{name}: {us:.1f} us/attn  ~{gbs:.0f} GB/s (of stored K+V)  "
          f"mean={float(np.asarray(out, np.float32).mean()):+.4f}")
    return us


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    print(f"devices={jax.devices()} B={B} L={L} E={E} H={H} iters={iters}")
    roundtrip = calibrate(B)

    key = jax.random.PRNGKey(0)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, L, E), DT)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, L, E), DT)
    q0 = jax.random.normal(jax.random.fold_in(key, 3), (B, 1, E), DT)
    k_i8, kscale = quantize(k)
    v_i8, vscale = quantize(v)

    # numerics: int8 vs bf16 path on the same inputs
    a = np.asarray(bf16_attn(q0, k, v), np.float32)
    b_ = np.asarray(int8_attn(q0, k_i8, kscale, v_i8, vscale), np.float32)
    denom = np.abs(a).max()
    print(f"|bf16 - int8|: max={np.abs(a - b_).max():.5f} "
          f"mean={np.abs(a - b_).mean():.5f} (rel max {np.abs(a-b_).max()/denom:.4f})")

    def mk_bf16():
        @jax.jit
        def loop(q0):
            def body(q, _):
                out = bf16_attn(q, k, v)
                return out * jnp.asarray(0.5, q.dtype) + q0, ()
            q, _ = jax.lax.scan(body, q0, jnp.arange(iters))
            return q
        return loop, q0

    def mk_int8():
        @jax.jit
        def loop(q0):
            def body(q, _):
                out = int8_attn(q, k_i8, kscale, v_i8, vscale)
                return out * jnp.asarray(0.5, q.dtype) + q0, ()
            q, _ = jax.lax.scan(body, q0, jnp.arange(iters))
            return q
        return loop, q0

    bf = run("bf16 einsum (current)", mk_bf16, 2 * B * L * E * 2, B, L,
             iters, roundtrip)
    i8 = run("int8 K/V             ", mk_int8, 2 * B * L * E * 1, B, L,
             iters, roundtrip)
    print(f"speedup: {bf / i8:.2f}x")


if __name__ == "__main__":
    main()

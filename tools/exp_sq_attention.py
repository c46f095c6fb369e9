"""Single-query (decode) cross-attention layout experiments.

The decode chain's floor is streaming cross K/V [B, L, E]. The standard
einsum path contracts the 32-wide head dim ('bqhd,bkhd->bhqk'), so K/V are
consumed at 32 of 128 lanes — docs/PERF.md measured it at ~270 GB/s.

Variant 'fullwidth' streams K and V at full lane width instead:

    scores[b,l,h] = sum_d (K[b,l,:] * q[b,:]) grouped per head   (VPU)
    ctx[b,:]      = sum_l probs[b,l,h->broadcast d] * V[b,l,:]    (VPU)

i.e. broadcast-multiply + segment-reduce replaces the matvec; every K/V
load uses all 128 lanes. Same math (different summation grouping).

Usage: python tools/exp_sq_attention.py [B] [L] [iters]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

E, H = 256, 8
D = E // H
DT = jnp.bfloat16


def einsum_attn(q, k, v):
    """Current path (ops/attention.attend_with_kv_merged math)."""
    b = q.shape[0]
    qh = q.reshape(b, 1, H, D)
    kh = k.reshape(b, -1, H, D)
    vh = v.reshape(b, -1, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh * jnp.asarray(1 / np.sqrt(D), q.dtype),
                   kh, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, -1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, 1, E)


def fullwidth_attn(q, k, v):
    """Full-lane-width streams: multiply-reduce instead of matvec."""
    b, l, e = k.shape
    prod = k.astype(jnp.float32) * (q * jnp.asarray(1 / np.sqrt(D), q.dtype)
                                    ).astype(jnp.float32)   # [B, L, E]
    scores = prod.reshape(b, l, H, D).sum(-1)                # [B, L, H] f32
    p = jax.nn.softmax(scores, axis=1)                       # over L
    pfull = jnp.broadcast_to(p[..., None], (b, l, H, D)).reshape(b, l, e)
    ctx = (pfull.astype(v.dtype) * v).astype(jnp.float32).sum(axis=1)
    return ctx.astype(v.dtype).reshape(b, 1, e)


def fullwidth_attn_bf16mul(q, k, v):
    """Same but the broadcast multiplies stay bf16 (accumulate f32)."""
    b, l, e = k.shape
    prod = k * (q * jnp.asarray(1 / np.sqrt(D), q.dtype))    # [B, L, E] bf16
    scores = prod.reshape(b, l, H, D).sum(-1, dtype=jnp.float32)
    p = jax.nn.softmax(scores, axis=1)
    pfull = jnp.broadcast_to(p[..., None], (b, l, H, D)).reshape(b, l, e)
    ctx = (pfull.astype(v.dtype) * v).sum(axis=1, dtype=jnp.float32)
    return ctx.astype(v.dtype).reshape(b, 1, e)


def run(name, fn, B, L, iters):
    k = jax.random.normal(jax.random.PRNGKey(0), (B, L, E), DT)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, L, E), DT)

    @jax.jit
    def loop(q0, k, v):
        def body(q, _):
            out = fn(q, k, v)
            return out * jnp.asarray(0.5, q.dtype) + q0, ()
        q, _ = jax.lax.scan(body, q0, jnp.arange(iters))
        return q

    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, E), DT)
    out = np.asarray(loop(q0, k, v))
    times = []
    for r in range(5):
        qr = q0 + jnp.asarray(0.01 * r, DT)
        t0 = time.time()
        np.asarray(loop(qr, k, v))
        times.append(time.time() - t0)
    us = float(np.median(times)) / iters * 1e6
    gbs = (2 * B * L * E * 2) / (us * 1e-6) / 1e9
    print(f"{name}: {us:.1f} us/attn  ~{gbs:.0f} GB/s  "
          f"mean={float(np.asarray(out, np.float32).mean()):+.4f}")
    return us


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    print(f"devices={jax.devices()} B={B} L={L} E={E} H={H} iters={iters}")
    calibrate(B)

    # numerical agreement first (f32 on small case)
    q = jax.random.normal(jax.random.PRNGKey(5), (4, 1, E), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(6), (4, 37, E), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(7), (4, 37, E), jnp.float32)
    a = np.asarray(einsum_attn(q, k, v), np.float32)
    b_ = np.asarray(fullwidth_attn(q, k, v), np.float32)
    print("max |einsum - fullwidth| (f32):", np.abs(a - b_).max())

    run("einsum (current)      ", einsum_attn, B, L, iters)
    run("fullwidth f32-mul     ", fullwidth_attn, B, L, iters)
    run("fullwidth bf16-mul    ", fullwidth_attn_bf16mul, B, L, iters)
    run_t("ktrans  (K=[B,E,L])   ", ktrans_attn, B, L, iters)
    run_t("ktrans2 (K,V=[B,E,L]) ", ktrans2_attn, B, L, iters, v_trans=True)


def calibrate(B):
    """Measure the fixed per-call relay roundtrip with a trivial program."""
    @jax.jit
    def nop(x):
        return x + jnp.asarray(1.0, x.dtype)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, E), DT)
    np.asarray(nop(x))
    times = []
    for r in range(7):
        t0 = time.time()
        np.asarray(nop(x + jnp.asarray(r * 0.1, DT)))
        times.append(time.time() - t0)
    print(f"relay roundtrip (trivial call): {np.median(times)*1e3:.1f} ms")


def ktrans_attn(q, k_t, v):
    """K stored transposed [B, E, L]: score reduce over sublane groups
    (cheap), ctx reduce over L sublanes in [B, L, E] (cheap). The only
    lane-direction work is the [B, H, L] softmax."""
    b, e, l = k_t.shape
    qs = (q * jnp.asarray(1 / np.sqrt(D), q.dtype)).reshape(b, e, 1)
    prod = k_t * qs                                          # [B, E, L] bf16
    scores = prod.reshape(b, H, D, l).sum(2, dtype=jnp.float32)  # [B, H, L]
    p = jax.nn.softmax(scores, axis=-1)                      # over L (lanes)
    pfull = jnp.broadcast_to(p[:, :, None, :], (b, H, D, l)) \
        .reshape(b, e, l)                                    # [B, E, L]
    # transpose probs to [B, L, E] to pair with V's layout
    pv = jnp.swapaxes(pfull, 1, 2).astype(v.dtype)           # [B, L, E]
    ctx = (pv * v).sum(axis=1, dtype=jnp.float32)            # over L sublanes
    return ctx.astype(v.dtype).reshape(b, 1, e)


def ktrans2_attn(q, k_t, v):
    """Like ktrans but the ctx stage multiplies in the [B, E, L] domain and
    reduces over L (lanes) — avoids the probs transpose, pays a V transpose
    at precompute time instead (pass v as [B, E, L])."""
    b, e, l = k_t.shape
    qs = (q * jnp.asarray(1 / np.sqrt(D), q.dtype)).reshape(b, e, 1)
    prod = k_t * qs
    scores = prod.reshape(b, H, D, l).sum(2, dtype=jnp.float32)
    p = jax.nn.softmax(scores, axis=-1)
    pfull = jnp.broadcast_to(p[:, :, None, :], (b, H, D, l)).reshape(b, e, l)
    ctx = (pfull.astype(v.dtype) * v).sum(axis=-1, dtype=jnp.float32)
    return ctx.astype(jnp.bfloat16).reshape(b, 1, e)


def run_t(name, fn, B, L, iters, v_trans=False):
    k = jax.random.normal(jax.random.PRNGKey(0), (B, E, L), DT)
    v_shape = (B, E, L) if v_trans else (B, L, E)
    v = jax.random.normal(jax.random.PRNGKey(1), v_shape, DT)

    @jax.jit
    def loop(q0, k, v):
        def body(q, _):
            out = fn(q, k, v)
            return out * jnp.asarray(0.5, q.dtype) + q0, ()
        q, _ = jax.lax.scan(body, q0, jnp.arange(iters))
        return q

    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, E), DT)
    np.asarray(loop(q0, k, v))
    times = []
    for r in range(5):
        qr = q0 + jnp.asarray(0.01 * r, DT)
        t0 = time.time()
        np.asarray(loop(qr, k, v))
        times.append(time.time() - t0)
    us = float(np.median(times)) / iters * 1e6
    gbs = (2 * B * L * E * 2) / (us * 1e-6) / 1e9
    print(f"{name}: {us:.1f} us/attn  ~{gbs:.0f} GB/s")


if __name__ == "__main__":
    main()

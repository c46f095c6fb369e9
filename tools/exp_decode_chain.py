"""Decode layer-chain restructure experiments (docs/PERF.md round-2 item).

Isolates the 8-layer decoder chain of the CaSE/Masque decode step (two
4-layer stacks; cross memories L=60 and L=1000) and compares per-step
variants:

  v0  current ops/transformer.py step math: separate q / (k,v) projections,
      two dynamic_update_slice cache writes per layer
  v1  fused self-attn QKV (one [E,3E] matmul) + single [B,T,2E] cache buffer
      (one cache write per layer)
  v2  v1 + scan unroll=2

All variants compute the same function (same weights, same math, different
groupings). Timing: K-iteration in-jit scan with a data dependency between
steps, host fetch at the end (CLAUDE.md: relay timing lies otherwise).

Usage: python tools/exp_decode_chain.py [B] [T]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

E, H, DFF = 256, 8, 256
L1, L2 = 60, 1000
DT = jnp.bfloat16


def make_layer_params(key):
    ks = jax.random.split(key, 8)
    s = 0.02
    return {
        "qkv_w": jax.random.normal(ks[0], (E, 3 * E), DT) * s,
        "qkv_b": jnp.zeros((3 * E,), DT),
        "out_w": jax.random.normal(ks[1], (E, E), DT) * s,
        "out_b": jnp.zeros((E,), DT),
        "cq_w": jax.random.normal(ks[2], (E, E), DT) * s,
        "cq_b": jnp.zeros((E,), DT),
        "co_w": jax.random.normal(ks[3], (E, E), DT) * s,
        "co_b": jnp.zeros((E,), DT),
        "w1": jax.random.normal(ks[4], (E, DFF), DT) * s,
        "b1": jnp.zeros((DFF,), DT),
        "w2": jax.random.normal(ks[5], (DFF, E), DT) * s,
        "b2": jnp.zeros((E,), DT),
        "ln": [(jnp.ones((E,), DT), jnp.zeros((E,), DT)) for _ in range(3)],
    }


def ln(x, g_b):
    g, b = g_b
    m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
            ).astype(x.dtype) * g + b


def sdpa(q, k, v):  # [B,1,E] x [B,L,E] merged-head
    b, lq, e = q.shape
    d = e // H
    qh = q.reshape(b, lq, H, d)
    kh = k.reshape(b, -1, H, d)
    vh = v.reshape(b, -1, H, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh * (1.0 / np.sqrt(d)).astype(q.dtype),
                   kh, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, -1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, lq, e)


def layer_step_v0(p, x, t, kc, vc, ck, cv):
    h = ln(x, p["ln"][0])
    k_t = h @ p["qkv_w"][:, E:2 * E] + p["qkv_b"][E:2 * E]
    v_t = h @ p["qkv_w"][:, 2 * E:] + p["qkv_b"][2 * E:]
    kc = jax.lax.dynamic_update_slice(kc, k_t, (0, t, 0))
    vc = jax.lax.dynamic_update_slice(vc, v_t, (0, t, 0))
    q = h @ p["qkv_w"][:, :E] + p["qkv_b"][:E]
    a = sdpa(q, kc, vc) @ p["out_w"] + p["out_b"]
    x = x + a
    h = ln(x, p["ln"][1])
    cq = h @ p["cq_w"] + p["cq_b"]
    c = sdpa(cq, ck, cv) @ p["co_w"] + p["co_b"]
    x = x + c
    h = ln(x, p["ln"][2])
    f = jax.nn.gelu(h @ p["w1"] + p["b1"], approximate=False) @ p["w2"] + p["b2"]
    return x + f, kc, vc


def layer_step_v1(p, x, t, cache, ck, cv):
    h = ln(x, p["ln"][0])
    qkv = h @ p["qkv_w"] + p["qkv_b"]           # one matmul
    q, kv = qkv[..., :E], qkv[..., E:]
    cache = jax.lax.dynamic_update_slice(cache, kv, (0, t, 0))  # one write
    a = sdpa(q, cache[..., :E], cache[..., E:]) @ p["out_w"] + p["out_b"]
    x = x + a
    h = ln(x, p["ln"][1])
    cq = h @ p["cq_w"] + p["cq_b"]
    c = sdpa(cq, ck, cv) @ p["co_w"] + p["co_b"]
    x = x + c
    h = ln(x, p["ln"][2])
    f = jax.nn.gelu(h @ p["w1"] + p["b1"], approximate=False) @ p["w2"] + p["b2"]
    return x + f, cache


def run_variant(name, params, crosses, B, T, unroll=1, merged_cache=False):
    n_layers = len(params)

    @jax.jit
    def decode(x0, caches, params, crosses):
        def chain(carry, t):
            x, caches = carry
            new = []
            for i in range(n_layers):
                if merged_cache:
                    y, c = layer_step_v1(params[i], x, t, caches[i],
                                         *crosses[i])
                    new.append(c)
                else:
                    y, kc, vc = layer_step_v0(params[i], x, t, caches[i][0],
                                              caches[i][1], *crosses[i])
                    new.append((kc, vc))
                x = y
            # data dependency into the next step
            return (x * jnp.asarray(0.5, x.dtype), new), ()

        (xT, _), _ = jax.lax.scan(chain, (x0, caches), jnp.arange(T),
                                  unroll=unroll)
        return xT

    def init_caches():
        if merged_cache:
            return [jnp.zeros((B, T, 2 * E), DT) for _ in range(n_layers)]
        return [(jnp.zeros((B, T, E), DT), jnp.zeros((B, T, E), DT))
                for _ in range(n_layers)]

    x0 = jax.random.normal(jax.random.PRNGKey(9), (B, 1, E), DT)
    out = np.asarray(decode(x0, init_caches(), params, crosses))  # compile+sync
    reps = 5
    times = []
    for r in range(reps):
        xr = x0 + jnp.asarray(r * 0.01, DT)
        t0 = time.time()
        np.asarray(decode(xr, init_caches(), params, crosses))
        times.append(time.time() - t0)
    med = float(np.median(times))
    print(f"{name}: {med*1e3:.2f} ms/decode ({med/T*1e6:.1f} us/step) "
          f"out_mean={float(np.asarray(out, np.float32).mean()):.4f}")
    return med


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    print(f"devices={jax.devices()} B={B} T={T} dtype={DT.__name__}")
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    params = [make_layer_params(k) for k in keys]
    mems = []
    for i in range(8):
        L = L1 if i < 4 else L2
        ck = jax.random.normal(jax.random.PRNGKey(100 + i), (B, L, E), DT)
        cv = jax.random.normal(jax.random.PRNGKey(200 + i), (B, L, E), DT)
        mems.append((ck, cv))

    run_variant("v0 separate-proj 2-write", params, mems, B, T)
    run_variant("v1 fused-qkv 1-write   ", params, mems, B, T,
                merged_cache=True)
    run_variant("v2 v1+unroll2          ", params, mems, B, T, unroll=2,
                merged_cache=True)
    run_variant("v3 v0+unroll2          ", params, mems, B, T, unroll=2)


if __name__ == "__main__":
    main()

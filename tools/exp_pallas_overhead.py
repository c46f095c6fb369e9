"""Pallas fixed-overhead probe on this TPU backend.

Compares a K-iteration scan whose body is (a) a trivial XLA elementwise op,
(b) the same op as a single-block Pallas kernel, (c) a small fused
multi-matmul Pallas kernel vs (d) the same three matmuls as XLA ops.
The per-iteration delta is the per-kernel-invocation overhead — the go/no-go
number for fusing the decode layer's ~10 tiny ops into one kernel
(docs/PERF.md round-3 lever).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, E = 64, 256
DT = jnp.bfloat16


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.asarray(1.0009765625, x_ref.dtype)


def pallas_scale(x):
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def mm3_kernel(x_ref, w1_ref, w2_ref, w3_ref, o_ref):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.tanh(h).astype(x_ref.dtype)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    o_ref[:] = jnp.dot(h, w3_ref[:],
                       preferred_element_type=jnp.float32).astype(x_ref.dtype)


def pallas_mm3(x, w1, w2, w3):
    return pl.pallas_call(
        mm3_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w1, w2, w3)


def xla_mm3(x, w1, w2, w3):
    h = jnp.tanh(jnp.dot(x, w1, preferred_element_type=jnp.float32)
                 ).astype(x.dtype)
    h = jnp.maximum(jnp.dot(h, w2, preferred_element_type=jnp.float32), 0.0
                    ).astype(x.dtype)
    return jnp.dot(h, w3,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def bench(name, body, args, iters):
    @jax.jit
    def loop(x0, *rest):
        def f(x, _):
            return body(x, *rest) , ()
        x, _ = jax.lax.scan(f, x0, jnp.arange(iters))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, E), DT)
    np.asarray(loop(x0, *args))
    times = []
    for r in range(5):
        t0 = time.time()
        np.asarray(loop(x0 + jnp.asarray(0.01 * r, DT), *args))
        times.append(time.time() - t0)
    us = float(np.median(times)) / iters * 1e6
    print(f"{name}: {us:.2f} us/iter")
    return us


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    print(f"devices={jax.devices()} B={B} E={E} iters={iters}")
    ws = [jax.random.normal(jax.random.PRNGKey(i), (E, E), DT) * 0.05
          for i in range(1, 4)]
    xla1 = bench("xla scale (1 op)      ", lambda x: x * jnp.asarray(
        1.0009765625, x.dtype), (), iters)
    pal1 = bench("pallas scale (1 krnl) ", pallas_scale, (), iters)
    xla3 = bench("xla 3-matmul chain    ", xla_mm3, tuple(ws), iters)
    pal3 = bench("pallas 3-matmul kernel", pallas_mm3, tuple(ws), iters)
    print(f"pallas per-kernel overhead ~ {pal1 - xla1:.2f} us "
          f"(3mm delta {pal3 - xla3:+.2f} us)")


if __name__ == "__main__":
    main()

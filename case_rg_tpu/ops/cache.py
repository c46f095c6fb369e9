"""Decode-cache write helpers.

One helper shared by the scan decode (scalar step index) and the
continuous-batching chunk decode (per-row step indices — rows refilled
mid-flight sit at different absolute positions). The math of a decode step
is row-independent, so writing each row's slot at its own ``t`` keeps the
chunked decode bit-identical to the scan decode for rows in lockstep
(tests/test_continuous.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def write_step(buf: jnp.ndarray, val: jnp.ndarray, t) -> jnp.ndarray:
    """Write ``val`` [B, 1, ...] into ``buf`` [B, T, ...] at step ``t``.

    ``t`` scalar: one dynamic_update_slice (the scan decode's layout).
    ``t`` [B]: per-row indexed scatter (continuous batching); rows whose
    ``t`` is out of range (done rows are pointed at T) skip their write.
    """
    t = jnp.asarray(t)
    if t.ndim == 0:
        start = (0, t) + (0,) * (buf.ndim - 2)
        return jax.lax.dynamic_update_slice(buf, val, start)
    b = buf.shape[0]
    return buf.at[jnp.arange(b), t].set(val[:, 0], mode="drop")

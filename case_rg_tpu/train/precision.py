"""Mixed-precision utilities.

TPU-native serving runs matmuls in bfloat16 (MXU native). The framework keeps
f32 master parameters for training; for inference (or bf16 training
experiments) parameters are cast at the boundary with ``cast_params``.
Numerically sensitive reductions stay in f32 regardless of the parameter
dtype: attention scores accumulate in f32 before the softmax
(ops/attention.attend), and losses are computed in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(tree, dtype=jnp.bfloat16):
    """Cast every float32 leaf to ``dtype`` (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def cast_batch(batch, dtype=jnp.bfloat16):
    return cast_params(batch, dtype)


def cast_params_fused(tree, dtype=jnp.bfloat16):
    """One-shot master-weight cast: ravel every f32 leaf into a single
    vector, convert ONCE, and slice the leaves back out.

    Round-15's final train attribution found ~7.5 ms/step (4.6%) of
    `copy-done` ops — XLA schedules the ~200 per-leaf f32->bf16 casts of
    `cast_params` as individual async copies whose tails don't fully
    overlap (docs/PERF.md). The actual bytes are tiny (46 MB read +
    23 MB write ~ 0.1 ms at peak), so the cost is per-copy scheduling
    overhead; this formulation gives the scheduler one big convert
    instead. Gated by Trainer(fused_cast=...) / exp_train_bench --fcast
    for the measured decision; numerics identical (same cast per
    element).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    f32 = [(i, x) for i, x in enumerate(leaves)
           if hasattr(x, "dtype") and x.dtype == jnp.float32]
    if not f32:
        return tree
    flat = jnp.concatenate([x.reshape(-1) for _, x in f32]).astype(dtype)
    out = list(leaves)
    off = 0
    for i, x in f32:
        n = x.size
        out[i] = jax.lax.dynamic_slice_in_dim(flat, off, n).reshape(x.shape)
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


# measured-decision toggle for the fused cast (exp_train_bench --fcast)
_FUSED_CAST = False


def set_fused_cast(on: bool) -> None:
    global _FUSED_CAST
    _FUSED_CAST = bool(on)


def cast_params_auto(tree, dtype=jnp.bfloat16):
    """cast_params or cast_params_fused per the process-wide toggle."""
    return (cast_params_fused if _FUSED_CAST else cast_params)(tree, dtype)

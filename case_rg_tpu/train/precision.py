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

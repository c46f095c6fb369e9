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


def cast_params_grouped(tree, dtype=jnp.bfloat16):
    """Per-top-level-module fused cast: one ravel+convert per first-level
    subtree (encoder, ps_tower, sti_tower, decoder, ...) instead of
    either ~200 per-leaf copies (`cast_params`) or one monolithic
    convert (`cast_params_fused`).

    Rationale: the whole-tree ravel was REFUTED 218.1 vs 166.8 ms/step
    (docs/PERF.md round 15) because the single concat must wait for
    EVERY master leaf and every consumer then depends on the one
    convert — it serializes the step start. Grouping by module keeps
    the op count ~10 while letting each module's bf16 params become
    ready independently, so e.g. the encoder can start as soon as its
    own group converts. Numerics identical (same per-element cast);
    gated by the same measured-decision toggle (mode 2)."""
    import collections.abc
    if not isinstance(tree, collections.abc.Mapping) or not tree:
        return cast_params_fused(tree, dtype)
    out = {k: cast_params_fused(sub, dtype) for k, sub in tree.items()}
    try:  # preserve FrozenDict-ness for callers that rely on it
        from flax.core import FrozenDict
        if isinstance(tree, FrozenDict):
            return FrozenDict(out)
    except Exception:
        pass
    return out


# measured-decision toggle for the fused cast (exp_train_bench --fcast):
# 0 = per-leaf (shipped default), 1 = whole-tree ravel (refuted),
# 2 = per-module grouped
_FUSED_CAST = 0


def set_fused_cast(mode) -> None:
    global _FUSED_CAST
    _FUSED_CAST = int(mode)


def cast_params_auto(tree, dtype=jnp.bfloat16):
    """cast_params / cast_params_fused / cast_params_grouped per the
    process-wide toggle."""
    fn = {0: cast_params, 1: cast_params_fused,
          2: cast_params_grouped}[_FUSED_CAST]
    return fn(tree, dtype)

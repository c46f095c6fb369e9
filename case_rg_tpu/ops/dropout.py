"""Seeded-recompute dropout: drop the stored mask from the backward pass.

The CaSE train step is bandwidth-bound at 15-16% MFU (docs/PERF.md round
11), and the round-12 per-op xprof attributes ~28 ms/step to 11-wide
per-layer dropout mask-apply fusion families — the forward writes each
mask (or its fused representative) to HBM and the backward reads it
again. The masks are pure functions of (rng key, shape), and with the
``rbg`` hardware RNG (the train default since round 10) regenerating them
costs almost nothing — so a ``jax.custom_vjp`` dropout whose only
residual is the KEY trades that HBM round-trip for cheap recompute:

* forward: the exact flax formula — ``lax.select(bernoulli(key, kp),
  x / kp, 0)`` — so outputs are BITWISE-identical to ``nn.Dropout``;
* backward: regenerate the same bernoulli mask from the key and apply
  ``select(mask, g / kp, 0)`` — algebraically and bitwise identical to
  XLA's AD of the default path (0 / kp == 0), but with no stored-mask
  read.

Opt-in via ``set_seeded_dropout(True)`` (``run --seeded_dropout``): the
default path keeps flax's ``nn.Dropout`` byte-for-byte (same module
auto-names, same ``make_rng`` fold, same arithmetic), so flipping the
flag changes neither the loss nor the gradients — only which tensors
survive to the backward pass (equivalence-tested in
tests/test_trainer.py).

Reference anchor: the reference's dropout sites are torch ``F.dropout``
inside every encoder/decoder layer (common/TransformerEncoder.py:71-74,
TransformerDecoder.py:61-90); torch also stores the mask.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_SEEDED = False


def set_seeded_dropout(on: bool) -> None:
    """Process-wide trace-time switch (same pattern as
    ``models.multimem.set_fused_stack``)."""
    global _SEEDED
    _SEEDED = bool(on)


def seeded_dropout_enabled() -> bool:
    return _SEEDED


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _seeded(x, key, rate: float):
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep_prob, shape=x.shape)
    return jax.lax.select(mask, x / keep_prob, jnp.zeros_like(x))


def _seeded_fwd(x, key, rate: float):
    return _seeded(x, key, rate), key


def _seeded_bwd(rate: float, key, g):
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep_prob, shape=g.shape)
    return (jax.lax.select(mask, g / keep_prob, jnp.zeros_like(g)), None)


_seeded.defvjp(_seeded_fwd, _seeded_bwd)


class Dropout(nn.Dropout):
    """Drop-in ``nn.Dropout`` whose backward can regenerate the mask.

    Subclassing keeps flax's auto-naming (``Dropout_N``) and therefore the
    exact ``make_rng("dropout")`` fold of the modules it replaces — the
    training RNG stream is unchanged in BOTH modes. ``__call__`` restates
    the installed flax formula verbatim (it cannot delegate to
    ``super().__call__`` — both are @compact, and nested compact calls on
    one instance are an error) and routes the select through the
    custom-vjp only when seeded mode is on.
    """

    @nn.compact
    def __call__(self, inputs, deterministic: Optional[bool] = None,
                 rng=None):
        deterministic = nn.merge_param("deterministic", self.deterministic,
                                       deterministic)
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:   # prevent gradient NaNs in the edge case
            return jnp.zeros_like(inputs)
        keep_prob = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        if _SEEDED and not self.broadcast_dims:
            return _seeded(inputs, rng, self.rate)
        broadcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            broadcast_shape[dim] = 1
        mask = jax.random.bernoulli(rng, p=keep_prob,
                                    shape=broadcast_shape)
        mask = jnp.broadcast_to(mask, inputs.shape)
        return jax.lax.select(mask, inputs / keep_prob,
                              jnp.zeros_like(inputs))


def dropout_apply(x, rng, rate: float):
    """Functional form for non-module sites (ops/attention.attend's
    probs dropout — the [rows, H, L, L] score-shaped mask is the single
    fattest dropout tensor in the model). The caller already decided
    rate > 0 and not deterministic. NOTE: the legacy inline formula there
    was ``jnp.where(keep, p / kp, 0.0)`` — jnp.where and lax.select are
    elementwise-identical here (same-shape operands), so seeded mode is
    bitwise-equal to it too."""
    if not _SEEDED:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)
    return _seeded(x, rng, rate)

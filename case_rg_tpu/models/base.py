"""Model registry and loss helpers.

Loss forms mirror the reference exactly, extended with a per-sample weight
vector so padded final batches (data/batching.py) are loss-identical to the
reference's ragged last batch:

* ``nll_from_probs`` — F.nll_loss(log(p + 1e-8), ignore_index=0)
  (CaSE/Model.py:306, GTTP/Model.py:201, GLKS/Model.py:270)
* ``cross_entropy`` — F.cross_entropy(ignore_index=0)
  (S2SA/Model.py:113, TMemNet/Model.py:173)
* ``bce_with_logits`` — F.binary_cross_entropy_with_logits mean
  (CaSE/Model.py:283, TMemNet/Model.py:172)
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def wrap(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return wrap


def get_model(name: str):
    if name not in MODEL_REGISTRY:
        import importlib
        importlib.import_module(f".{name}", __package__)
    return MODEL_REGISTRY[name]


def _expand_weight(sample_weight, shape0):
    if sample_weight is None:
        return jnp.ones((shape0,), jnp.float32)
    return sample_weight.astype(jnp.float32)


def nll_from_probs(probs_at_target: jnp.ndarray, targets: jnp.ndarray,
                   sample_weight=None, eps: float = 1e-8) -> jnp.ndarray:
    """-log(p + eps) averaged over non-PAD target tokens."""
    w = _expand_weight(sample_weight, targets.shape[0])[:, None]
    tok_w = (targets != 0).astype(jnp.float32) * w
    loss = -jnp.log(probs_at_target + eps)
    return jnp.sum(loss * tok_w) / jnp.maximum(jnp.sum(tok_w), 1.0)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  sample_weight=None) -> jnp.ndarray:
    """Token-level CE with ignore_index=0. logits: [B, T, V], targets: [B, T]."""
    w = _expand_weight(sample_weight, targets.shape[0])[:, None]
    tok_w = (targets != 0).astype(jnp.float32) * w
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked * tok_w) / jnp.maximum(jnp.sum(tok_w), 1.0)


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    sample_weight=None) -> jnp.ndarray:
    """Elementwise sigmoid BCE, mean over all elements (optionally
    batch-weighted)."""
    w = _expand_weight(sample_weight, logits.shape[0])
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_b = per.reshape(logits.shape[0], -1)
    elems = per_b.shape[1]
    return jnp.sum(per_b.sum(axis=1) * w) / jnp.maximum(jnp.sum(w) * elems, 1.0)


def one_hot_labels(indices: jnp.ndarray, num: int) -> jnp.ndarray:
    """scatter_(1, label, 1) one-hot (CaSE/Model.py:281)."""
    return jax.nn.one_hot(indices, num, dtype=jnp.float32)

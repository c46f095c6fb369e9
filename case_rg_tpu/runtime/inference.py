"""Per-model inference dispatch.

Maps each model to its test-time output dict, mirroring the reference's
``forward(method='test')`` contracts:

* s2sa/gttp/glks -> {'answer'} via greedy or beam
  (S2SA/Model.py:116-122, GTTP/Model.py:204-212, GLKS/Model.py:254-262)
* tmemnet      -> {'answer', 'rank'} (TMemNet/Model.py:185-194)
* masque/case  -> {'answer', 'rank'} via their own decoders
  (Masque/Model.py:260-277, CaSE/Model.py:313-331)
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict, Optional

import jax

from ..config import ModelConfig
from ..models.predict import beam_predict, greedy_predict, sample_predict

PROTOCOL_MODELS = ("s2sa", "gttp", "glks", "tmemnet")


RANK_MODELS = ("case", "masque", "tmemnet")


def make_predict_fn(model, cfg: ModelConfig, max_len: int,
                    beam_width: int = 1, early_exit: bool = False,
                    fast_argmax: Optional[bool] = None,
                    decoding: str = "greedy",
                    sample_seed: int = 0, temperature: float = 1.0,
                    top_k: int = 0, top_p: float = 1.0,
                    rank_only: bool = False
                    ) -> Callable[[dict, dict], Dict]:
    name = cfg.name

    if rank_only:
        # ranking without generation: skip the sequential decode entirely.
        # Each rank model's ``rank`` method returns just the pool scores,
        # so XLA dead-code-eliminates the decoder (and for CaSE the
        # token-identification tower too) from the compiled program.
        if name not in RANK_MODELS:
            raise ValueError(f"model {name!r} has no rank head "
                             f"(rank_only needs one of {RANK_MODELS})")

        def fn(variables, batch):
            return {"rank": model.apply(variables, batch,
                                        method=type(model).rank)}
        return jax.jit(fn)

    if decoding == "sample":
        if beam_width > 1:
            raise ValueError("--decoding sample is incompatible with "
                             "beam_width>1 (pick one decode strategy)")
        # stateful rng stream: each call draws a fresh fold of the base key
        # (the reference consumes a global torch RNG stream the same way)
        base_rng = jax.random.PRNGKey(sample_seed)
        counter = itertools.count()

        if name in ("masque", "case"):
            def inner(variables, batch, rng):
                return model.apply(variables, batch, max_len=max_len,
                                   sample_rng=rng, temperature=temperature,
                                   top_k=top_k, top_p=top_p,
                                   method=type(model).predict)
        else:
            def inner(variables, batch, rng):
                enc = None
                if name == "tmemnet":
                    # encode once: the same pass provides decode memories and
                    # the rank scores (mirrors the greedy branch below)
                    enc = model.apply(variables, batch,
                                      method=type(model).encode)
                ids = sample_predict(model, variables, batch, max_len, rng,
                                     enc=enc, temperature=temperature,
                                     top_k=top_k, top_p=top_p)
                out = {"answer": ids}
                if name == "tmemnet":
                    out["rank"] = enc["ck_attn"]
                return out
        inner = jax.jit(inner)

        def fn(variables, batch):
            rng = jax.random.fold_in(base_rng, next(counter))
            return inner(variables, batch, rng)
        return fn

    if name in ("masque", "case"):
        def fn(variables, batch):
            return model.apply(variables, batch, max_len=max_len,
                               early_exit=early_exit, fast_argmax=fast_argmax,
                               beam_width=beam_width,
                               method=type(model).predict)
        return jax.jit(fn)

    def fn(variables, batch):
        enc = None
        if name == "tmemnet" and beam_width <= 1:
            # encode once: the same pass provides decode memories and the
            # knowledge-attention rank scores (TMemNet/Model.py:190-194
            # re-encodes; we reuse)
            enc = model.apply(variables, batch, method=type(model).encode)
        if beam_width > 1:
            ids = beam_predict(model, variables, batch, max_len, beam_width)
        else:
            ids = greedy_predict(model, variables, batch, max_len,
                                 early_exit=early_exit, enc=enc,
                                 fast_copy=fast_argmax)
        out = {"answer": ids}
        if name == "tmemnet":
            out["rank"] = enc["ck_attn"] if enc is not None else model.apply(
                variables, batch, method=type(model).rank)
        return out

    return jax.jit(fn)

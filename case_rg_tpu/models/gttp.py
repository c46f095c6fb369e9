"""GTTP — Get-To-The-Point pointer-generator over background passages.

TPU-native rebuild of GTTP/Model.py:133-212. The copy mixture
(GTTP/Model.py:14-43) becomes a scatter-add over background token ids
instead of a bmm with a [B, L, V] one-hot map; training gathers the target
probability directly (ops/copynet.py) so the full extended distribution is
never materialized during the loss.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..ops.copynet import copy_scatter
from ..ops.masking import neg_inf
from .base import nll_from_probs, register_model
from .bbc import BBCCore, BBCEncoders


@register_model("gttp")
class GTTPModel(nn.Module):
    cfg: ModelConfig
    STEP_EMITS_PROBS = True   # decode_step returns the normalized mixture

    def setup(self):
        c = self.cfg
        self.encoders = BBCEncoders(c.vocab_size, c.embedding_size,
                                    c.hidden_size, dropout=c.gru_dropout)
        self.dec = BBCCore(c.vocab_size, c.embedding_size, c.hidden_size,
                           num_layers=1, dropout=c.gru_dropout)
        init = nn.initializers.xavier_uniform()
        self.gen_linear = nn.Dense(c.vocab_size, kernel_init=init)
        self.copy_linear = nn.Dense(1, kernel_init=init)

    def encode(self, batch, *, deterministic: bool = True):
        enc = self.encoders(batch["context"], batch["background"],
                            deterministic=deterministic)
        enc["background"] = batch["background"]
        enc["src_uh"], enc["bg_uh"] = self.dec.key_projs(enc["c_out"], enc["b_out"])
        return enc

    def _gen_logits_and_gate(self, feature):
        """(PAD-masked vocab logits [B, V], p_copy [B, 1])
        (ref: GTTP/Model.py:25-32)."""
        logits = self.gen_linear(feature)
        logits = logits.at[:, 0].set(neg_inf(logits.dtype))
        p_copy = jax.nn.sigmoid(self.copy_linear(feature))  # [B, 1]
        return logits, p_copy

    def _vocab_and_copy(self, feature, bg_attn):
        """(vocab softmax with PAD zeroed, p_copy) (ref: GTTP/Model.py:25-32)."""
        logits, p_copy = self._gen_logits_and_gate(feature)
        vocab_probs = jax.nn.softmax(logits, axis=-1)
        return vocab_probs * (1.0 - p_copy), p_copy

    def decode_step(self, enc, state, prev_ids, *, deterministic: bool = True):
        """Returns (mixture probs over V [B, V], new_state)."""
        emb = self.dec.embed(prev_ids, deterministic)
        feature, state, _, bg_attn = self.dec.step(
            emb, state, enc["c_out"], enc["b_out"], enc["c_keep"],
            enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
        out_prob, p_copy = self._vocab_and_copy(feature, bg_attn)
        copied = copy_scatter(bg_attn, enc["background"], self.cfg.vocab_size)
        return out_prob + copied * p_copy, state

    def decode_step_parts(self, enc, state, prev_ids, *,
                          deterministic: bool = True):
        """Scatter-free step: (vocab mass [B, V], copy mass [B, Lb], state)
        with ``dist == vocab + scatter_add(copy, enc['background'])`` (the
        gate multiplies the attention BEFORE the scatter-sum — same value,
        ~1 ULP). The math spec for ``decode_step_fast``."""
        emb = self.dec.embed(prev_ids, deterministic)
        feature, state, _, bg_attn = self.dec.step(
            emb, state, enc["c_out"], enc["b_out"], enc["c_keep"],
            enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
        out_prob, p_copy = self._vocab_and_copy(feature, bg_attn)
        return out_prob, bg_attn * p_copy, state

    def prepare_fast_decode(self, enc):
        """Hoisted (step-invariant) gathered generator columns for the
        scatter-free greedy loop (kernels/copy_argmax)."""
        from ..kernels.copy_argmax import gather_weight_columns
        p = self.gen_linear.variables["params"]
        w_at, b_at = gather_weight_columns(p["kernel"].T, enc["background"],
                                           p["bias"])
        return {"w_at": w_at, "b_at": b_at}

    def decode_step_fast(self, enc, fast, state, prev_ids, *,
                         deterministic: bool = True):
        """(logits [B, V], logits-at-source-ids [B, Lb], vocab gate [B, 1],
        copy mass [B, Lb], state) for candidate_argmax_from_logits —
        ``dist == gate*softmax(logits) + scatter_add(copy, background)``."""
        emb = self.dec.embed(prev_ids, deterministic)
        feature, state, _, bg_attn = self.dec.step(
            emb, state, enc["c_out"], enc["b_out"], enc["c_keep"],
            enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
        logits, p_copy = self._gen_logits_and_gate(feature)
        l_at = jnp.einsum("bld,bd->bl", fast["w_at"],
                          feature.astype(fast["w_at"].dtype)) + fast["b_at"]
        # mirror the PAD mask on the gathered logits
        l_at = jnp.where(enc["background"] == 0, neg_inf(l_at.dtype), l_at)
        return logits, l_at, 1.0 - p_copy, bg_attn * p_copy, state

    def train_losses(self, batch, *, deterministic: bool = False):
        """NLL over the mixture at the gold tokens
        (ref: GTTP/Model.py:198-202)."""
        resp = batch["response"]
        b, t = resp.shape
        bos = jnp.full((b, 1), self.cfg.bos_id, resp.dtype)
        inputs = jnp.concatenate([bos, resp[:, :-1]], axis=1)
        embs = self.dec.embed(inputs, deterministic)
        enc = self.encode(batch, deterministic=deterministic)

        def body(state, xs):
            emb_t, resp_t = xs
            feature, state, _, bg_attn = self.dec.step(
                emb_t, state, enc["c_out"], enc["b_out"], enc["c_keep"],
                enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
            out_prob, p_copy = self._vocab_and_copy(feature, bg_attn)
            vocab_at = jnp.take_along_axis(out_prob, resp_t[:, None], axis=-1)[:, 0]
            match = (batch["background"] == resp_t[:, None]).astype(bg_attn.dtype)
            copy_at = jnp.sum(bg_attn * match, axis=-1) * p_copy[:, 0]
            return state, vocab_at + copy_at

        if self.is_initializing():
            body(enc["init_state"], (embs[:, 0], resp[:, 0]))
        _, prob_at = jax.lax.scan(body, enc["init_state"],
                                  (jnp.swapaxes(embs, 0, 1), resp.T))
        loss = nll_from_probs(prob_at.T, resp, batch.get("sample_weight"))
        return {"mle": loss}

"""S2SA — GRU seq2seq with attention over context and background.

TPU-native rebuild of S2SA/Model.py:50-123. Training runs the teacher-forced
decode as a ``lax.scan`` (the reference loops ``decode_to_end``,
common/Utils.py:97-143, in Python); inference uses the shared greedy/beam
scan loops (decode/loops.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from .base import register_model
from .bbc import BBCCore, BBCEncoders


@register_model("s2sa")
class S2SAModel(nn.Module):
    cfg: ModelConfig

    # The reference's generate() ignores its softmax flag and hands RAW
    # logits to the beam's -log(p + 1e-10) cost (S2SA/Model.py:98-99,
    # Generations.py:158-170); beam_predict reproduces that quirk.
    BEAM_RAW_SCORES = True

    def setup(self):
        c = self.cfg
        self.encoders = BBCEncoders(c.vocab_size, c.embedding_size,
                                    c.hidden_size, dropout=c.gru_dropout)
        self.dec = BBCCore(c.vocab_size, c.embedding_size, c.hidden_size,
                           num_layers=1, dropout=c.gru_dropout)
        self.gen = nn.Dense(c.vocab_size,
                            kernel_init=nn.initializers.xavier_uniform())

    def encode(self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True):
        enc = self.encoders(batch["context"], batch["background"],
                            deterministic=deterministic)
        enc["src_uh"], enc["bg_uh"] = self.dec.key_projs(enc["c_out"], enc["b_out"])
        return enc

    def decode_step(self, enc, state, prev_ids, *, deterministic: bool = True):
        """One step; returns (logits [B, V], new_state)."""
        emb = self.dec.embed(prev_ids, deterministic)
        feature, state, _, _ = self.dec.step(
            emb, state, enc["c_out"], enc["b_out"], enc["c_keep"],
            enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
        return self.gen(feature), state

    def train_losses(self, batch, *, deterministic: bool = False):
        """Teacher-forced CE (ref: decode_to_end + S2SA/Model.py:110-114).
        The target log-prob is gathered inside the scan so the full [B, T, V]
        logits tensor is never materialized."""
        resp = batch["response"]
        b, t = resp.shape
        bos = jnp.full((b, 1), self.cfg.bos_id, resp.dtype)
        inputs = jnp.concatenate([bos, resp[:, :-1]], axis=1)
        embs = self.dec.embed(inputs, deterministic)  # [B, T, E], per-pos dropout
        enc = self.encode(batch, deterministic=deterministic)

        def body(state, xs):
            emb_t, resp_t = xs
            feature, state, _, _ = self.dec.step(
                emb_t, state, enc["c_out"], enc["b_out"], enc["c_keep"],
                enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
            logits = self.gen(feature)
            logp = jnp.take_along_axis(logits, resp_t[:, None], axis=-1)[:, 0] \
                - jax.nn.logsumexp(logits, axis=-1)
            return state, logp

        if self.is_initializing():  # materialize params before the scan
            body(enc["init_state"], (embs[:, 0], resp[:, 0]))
        _, logp = jax.lax.scan(body, enc["init_state"],
                               (jnp.swapaxes(embs, 0, 1), resp.T))
        logp = logp.T  # [B, T]
        w = batch.get("sample_weight")
        w = jnp.ones((b,), jnp.float32) if w is None else w.astype(jnp.float32)
        tok_w = (resp != 0).astype(jnp.float32) * w[:, None]
        loss = -jnp.sum(logp * tok_w) / jnp.maximum(jnp.sum(tok_w), 1.0)
        return {"mle": loss}

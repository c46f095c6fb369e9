"""CaSE — the paper model: relevant passage selection, supporting token
identification, and copy-augmented response generation.

TPU-native rebuild of CaSE/Model.py:127-339. The three stages share one
3-layer transformer encoder; the decoder is the 2-memory copy decoder with
the answer-vector feature (models/multimem.py, use_feature=True).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..ops.masking import padding_mask
from .base import bce_with_logits, nll_from_probs, one_hot_labels, register_model
from .components import TransformerSeqEncoder
from .multimem import MultiMemoryDecoder
from .towers import InteractionTower

_LN_EPS = 1e-5


@register_model("case")
class CaSEModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        init = nn.initializers.xavier_uniform()
        self.encoder = TransformerSeqEncoder(c.enc_layers, c.num_heads,
                                             c.vocab_size, c.hidden_size,
                                             dropout=c.dropout)
        # RelevantPassageSelection (CaSE/Model.py:127-163)
        self.ps_tower = InteractionTower(c.hidden_size, c.num_heads,
                                         query_blocks=3, passage_blocks=5,
                                         dropout=c.dropout)
        self.ps_scorer = nn.Dense(1, kernel_init=init)
        # SupportingTokenIdentification (CaSE/Model.py:165-212)
        self.sti_tower = InteractionTower(c.hidden_size, c.num_heads,
                                          query_blocks=2, passage_blocks=3,
                                          dropout=c.dropout)
        self.sti_scorer = nn.Dense(1, kernel_init=init)
        self.sti_norm_q = nn.LayerNorm(epsilon=_LN_EPS)
        self.sti_norm_p = nn.LayerNorm(epsilon=_LN_EPS)
        # ResponseGeneration (CaSE/Model.py:214-253)
        self.decoder = MultiMemoryDecoder(
            c.vocab_size, c.hidden_size, c.num_heads, c.dec_layers,
            num_memories=2, use_feature=True, dropout=c.dropout,
            bos_id=c.bos_id, eos_id=c.eos_id)

    def stages(self, batch, *, deterministic: bool = True):
        """Run encode + passage selection + token identification.

        Returns dict with passage_score [B, P], token_score [B, P, Lp], and
        the updated reps feeding generation."""
        q_ids, p_ids = batch["query"], batch["passage"]
        q_keep, p_keep = padding_mask(q_ids), padding_mask(p_ids)
        enc_q, _ = self.encoder(q_ids, deterministic=deterministic)
        enc_p, _ = self.encoder(p_ids, deterministic=deterministic)

        q1, p1 = self.ps_tower(enc_q, enc_p, q_keep, p_keep,
                               deterministic=deterministic)
        passage_score = self.ps_scorer(p1[:, :, 0])[..., 0]   # [B, P]

        q2, p2 = self.sti_tower(q1, p1, q_keep, p_keep,
                                deterministic=deterministic)
        token_score = self.sti_scorer(p2)[..., 0]             # [B, P, Lp]
        token_score = jnp.where(p_keep, token_score, -1e6)
        token_score = jnp.clip(token_score, -1e6, 1e6)

        q_out = self.sti_norm_q(q1 + q2)   # (CaSE/Model.py:209-210)
        p_out = self.sti_norm_p(p1 + p2)
        return {"passage_score": passage_score, "token_score": token_score,
                "q_reps": q_out, "p_reps": p_out,
                "q_keep": q_keep, "p_keep": p_keep}

    def _decoder_inputs(self, batch, st):
        """Prior construction + answer vector
        (ref: ResponseGeneration.action, CaSE/Model.py:230-253)."""
        b = batch["query"].shape[0]
        d = self.cfg.hidden_size
        prior_p = (jax.nn.sigmoid(st["passage_score"])[:, :, None]
                   * jax.nn.sigmoid(st["token_score"]))      # [B, P, Lp]
        flat = prior_p.reshape(b, -1)
        flat = flat / (1e-8 + jnp.sum(flat, axis=-1, keepdims=True))
        p_flat = st["p_reps"].reshape(b, -1, d)
        answer_rep = jnp.einsum("bl,bld->bd", flat, p_flat)

        q_ids = batch["query"][:, 0]
        p_ids = batch["passage"].reshape(b, -1)
        memories = [st["q_reps"].reshape(b, -1, d), p_flat]
        keeps = [q_ids != 0, p_ids != 0]
        prior_q = jnp.ones_like(q_ids, jnp.float32)
        weights = [prior_q, flat]
        return memories, keeps, weights, [q_ids, p_ids], answer_rep

    def train_losses(self, batch, *, deterministic: bool = False):
        """(ref: CaSE/Model.py:273-311 do_train)"""
        w = batch.get("sample_weight")
        st = self.stages(batch, deterministic=deterministic)

        label_1h = one_hot_labels(batch["passage_label"],
                                  st["passage_score"].shape[-1])
        loss_ps = bce_with_logits(st["passage_score"], label_1h, w)

        # weighted token BCE (CaSE/Model.py:290-293)
        ts, lab = st["token_score"], batch["token_label"]
        per = jnp.maximum(ts, 0) - ts * lab + jnp.log1p(jnp.exp(-jnp.abs(ts)))
        mask = st["p_keep"].astype(jnp.float32)
        if w is not None:
            mask = mask * w.astype(jnp.float32)[:, None, None]
        loss_se = jnp.sum(mask * per * batch["token_weight"]) / \
            jnp.maximum(jnp.sum(mask), 1.0)

        memories, keeps, weights, src_ids, answer_rep = \
            self._decoder_inputs(batch, st)
        prob_at = self.decoder.teacher_force(
            memories, keeps, weights, src_ids, batch["response"],
            feature=answer_rep, deterministic=deterministic)
        loss_rg = nll_from_probs(prob_at, batch["response"], w)
        return {"select": loss_ps, "token": loss_se, "gen": loss_rg}

    def rank(self, batch, *, deterministic: bool = True) -> jnp.ndarray:
        """Passage scores only (rank-only serving). Under jit, XLA
        dead-code-eliminates the token-identification tower and the whole
        decoder, so this costs just encoder + selection tower — the
        reference has no rank-only inference (its closest analogue is
        Masque's ps_train training mode, Masque/Model.py:244-258)."""
        return self.stages(batch,
                           deterministic=deterministic)["passage_score"]

    def predict(self, batch, *, max_len: int, early_exit: bool = False,
                fast_argmax: Optional[bool] = None,
                beam_width: int = 1,
                sample_rng=None, temperature: float = 1.0, top_k: int = 0,
                top_p: float = 1.0) -> Dict[str, jnp.ndarray]:
        """(ref: CaSE/Model.py:313-331 do_test); ``sample_rng`` switches to
        categorical sampling (capability beyond the reference), with
        optional temperature/top_k/top_p controls."""
        st = self.stages(batch, deterministic=True)
        memories, keeps, weights, src_ids, answer_rep = \
            self._decoder_inputs(batch, st)
        if sample_rng is not None:
            ids = self.decoder.sample(memories, keeps, weights, src_ids,
                                      max_len, sample_rng, feature=answer_rep,
                                      unk_id=self.cfg.unk_id,
                                      temperature=temperature, top_k=top_k,
                                      top_p=top_p)
        elif beam_width > 1:
            ids = self.decoder.beam(memories, keeps, weights, src_ids,
                                    max_len, beam_width, feature=answer_rep)
        else:
            ids = self.decoder.decode(memories, keeps, weights, src_ids,
                                      max_len, feature=answer_rep,
                                      early_exit=early_exit,
                                      fast_argmax=fast_argmax)
        return {"answer": ids, "rank": st["passage_score"]}

    # ---- continuous-batching serving (runtime/continuous.py): encode +
    #      per-row decode state, advanced in chunks with mid-flight row
    #      refill; per-request answers are identical to ``predict`` ----

    def decode_init(self, batch, *, max_len: int,
                    fast_argmax: Optional[bool] = None):
        """(state, rank): the chunk-decode state for this batch plus the
        pool scores (host-side output)."""
        st = self.stages(batch, deterministic=True)
        memories, keeps, weights, src_ids, answer_rep = \
            self._decoder_inputs(batch, st)
        state = self.decoder.chunk_init(memories, keeps, weights, src_ids,
                                        max_len, feature=answer_rep,
                                        fast_argmax=fast_argmax,
                                        row_max=batch.get("response_cap"),
                                        row_keys=batch.get("sample_key"),
                                        row_ctl=batch.get("sample_ctl"))
        return state, st["passage_score"]

    def decode_chunk(self, state, *, n_steps: int,
                     fast_argmax: Optional[bool] = None,
                     sampling: bool = False, temperature: float = 1.0,
                     top_k: int = 0, top_p: float = 1.0):
        return self.decoder.chunk_step(state, n_steps,
                                       fast_argmax=fast_argmax,
                                       sampling=sampling,
                                       unk_id=self.cfg.unk_id,
                                       temperature=temperature,
                                       top_k=top_k, top_p=top_p)

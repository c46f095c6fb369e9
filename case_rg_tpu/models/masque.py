"""Masque — passage selection + multi-memory copy generation.

TPU-native rebuild of Masque/Model.py:121-286: shared 3-layer transformer
encoder, interaction ranking tower, and the 2-memory copy decoder
(models/multimem.py). The reference's unused span_frequency/span_overlap
inputs are omitted (see data/featurize.py).
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


@register_model("masque")
class MasqueModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.encoder = TransformerSeqEncoder(c.enc_layers, c.num_heads,
                                             c.vocab_size, c.hidden_size,
                                             dropout=c.dropout)
        self.tower = InteractionTower(c.hidden_size, c.num_heads,
                                      query_blocks=3, passage_blocks=5,
                                      dropout=c.dropout)
        self.scorer = nn.Dense(1, kernel_init=nn.initializers.xavier_uniform())
        self.decoder = MultiMemoryDecoder(
            c.vocab_size, c.hidden_size, c.num_heads, c.dec_layers,
            num_memories=2, use_feature=False, dropout=c.dropout,
            bos_id=c.bos_id, eos_id=c.eos_id)

    def _select(self, batch, *, deterministic: bool):
        """(ref: PassageSelection.action, Masque/Model.py:135-159)"""
        q_ids, p_ids = batch["query"], batch["passage"]
        enc_q, _ = self.encoder(q_ids, deterministic=deterministic)
        enc_p, _ = self.encoder(p_ids, deterministic=deterministic)
        q_keep, p_keep = padding_mask(q_ids), padding_mask(p_ids)
        q_reps, p_reps = self.tower(enc_q, enc_p, q_keep, p_keep,
                                    deterministic=deterministic)
        score = self.scorer(p_reps[:, :, 0])[..., 0]   # CLS position, [B, P]
        return score, q_reps, p_reps

    def _decoder_inputs(self, batch, score, q_reps, p_reps):
        """(ref: ResponseGeneration.action, Masque/Model.py:176-200)"""
        b = batch["query"].shape[0]
        d = self.cfg.hidden_size
        q_ids = batch["query"][:, 0]                   # [B, Lq]
        p_ids = batch["passage"].reshape(b, -1)        # [B, P*Lp]
        memories = [q_reps.reshape(b, -1, d), p_reps.reshape(b, -1, d)]
        keeps = [q_ids != 0, p_ids != 0]
        prior_q = jnp.ones_like(q_ids, jnp.float32)
        lp = batch["passage"].shape[2]
        prior_p = jnp.repeat(jax.nn.sigmoid(score), lp, axis=-1)
        weights = [prior_q, prior_p]
        return memories, keeps, weights, [q_ids, p_ids]

    def train_losses(self, batch, *, deterministic: bool = False,
                     mode: str = "train"):
        w = batch.get("sample_weight")
        score, q_reps, p_reps = self._select(batch, deterministic=deterministic)
        label_1h = one_hot_labels(batch["passage_label"], score.shape[-1])
        loss_ps = bce_with_logits(score, label_1h, w)
        if mode == "ps_train":     # rank-only mode (Masque/Model.py:244-258)
            return {"select": loss_ps}
        memories, keeps, weights, src_ids = self._decoder_inputs(
            batch, score, q_reps, p_reps)
        prob_at = self.decoder.teacher_force(
            memories, keeps, weights, src_ids, batch["response"],
            deterministic=deterministic)
        loss_rg = nll_from_probs(prob_at, batch["response"], w)
        return {"select": 0.25 * loss_ps, "gen": loss_rg}

    def rank(self, batch, *, deterministic: bool = True) -> jnp.ndarray:
        """Passage scores only (rank-only serving) — the inference
        counterpart of the reference's ps_train rank-only training mode
        (Masque/Model.py:244-258). The decoder is dead-code-eliminated
        under jit."""
        return self._select(batch, deterministic=deterministic)[0]

    def predict(self, batch, *, max_len: int, early_exit: bool = False,
                fast_argmax: Optional[bool] = None,
                beam_width: int = 1,
                sample_rng=None, temperature: float = 1.0, top_k: int = 0,
                top_p: float = 1.0) -> Dict[str, jnp.ndarray]:
        """(ref: Masque/Model.py:260-277 do_test); ``sample_rng`` switches to
        categorical sampling (capability beyond the reference), with
        optional temperature/top_k/top_p controls."""
        score, q_reps, p_reps = self._select(batch, deterministic=True)
        memories, keeps, weights, src_ids = self._decoder_inputs(
            batch, score, q_reps, p_reps)
        if sample_rng is not None:
            ids = self.decoder.sample(memories, keeps, weights, src_ids,
                                      max_len, sample_rng,
                                      unk_id=self.cfg.unk_id,
                                      temperature=temperature, top_k=top_k,
                                      top_p=top_p)
        elif beam_width > 1:
            ids = self.decoder.beam(memories, keeps, weights, src_ids,
                                    max_len, beam_width)
        else:
            ids = self.decoder.decode(memories, keeps, weights, src_ids,
                                      max_len, early_exit=early_exit,
                                      fast_argmax=fast_argmax)
        return {"answer": ids, "rank": score}

    # ---- continuous-batching serving (runtime/continuous.py) ----

    def decode_init(self, batch, *, max_len: int,
                    fast_argmax: Optional[bool] = None):
        score, q_reps, p_reps = self._select(batch, deterministic=True)
        memories, keeps, weights, src_ids = self._decoder_inputs(
            batch, score, q_reps, p_reps)
        state = self.decoder.chunk_init(memories, keeps, weights, src_ids,
                                        max_len, fast_argmax=fast_argmax,
                                        row_max=batch.get("response_cap"),
                                        row_keys=batch.get("sample_key"),
                                        row_ctl=batch.get("sample_ctl"))
        return state, score

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

"""TMemNet — Transformer Memory Network (Wizard-of-Wikipedia style).

TPU-native rebuild of TMemNet/Model.py:42-194: a shared 8-layer encoder over
context + K passages, dot-product knowledge attention on sqrt-pooled/scaled
sentence embeddings, hard selection (gold at train, argmax at eval), and an
8-layer decoder over [chosen-knowledge ; context].

The reference's eval decode re-runs the whole prefix per step
(TMemNet/Model.py:141-147) and is in fact broken under common/Generations.py
(the ``decode_step`` arity mismatch noted in SURVEY §4); here decoding is a
cached ``lax.scan`` via the shared step protocol — a working equivalent.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..ops.embedding import Embedding
from ..ops.masking import masked_mean, padding_mask
from ..ops.positional import PositionalEmbedding
from ..ops.transformer import Decoder, Encoder
from .base import bce_with_logits, cross_entropy, one_hot_labels, register_model


@register_model("tmemnet")
class TMemNetModel(nn.Module):
    cfg: ModelConfig
    # decode_step takes per_row=True for continuous batching (its state
    # carries the absolute position; the GRU models' states do not)
    STEP_PER_ROW = True

    def setup(self):
        c = self.cfg
        h = c.hidden_size
        self.enc_embedding = Embedding(c.vocab_size, c.embedding_size)
        self.enc_pos = PositionalEmbedding(c.embedding_size, dropout=c.dropout,
                                           max_len=5000)
        self.encoder = Encoder(c.tmemnet_layers, h, c.num_heads, d_ff=h,
                               dropout=c.dropout, activation="gelu")
        self.dec_embedding = Embedding(c.vocab_size, c.embedding_size)
        self.dec_pos = PositionalEmbedding(c.embedding_size, dropout=c.dropout,
                                           max_len=5000)
        self.decoder = Decoder(c.tmemnet_layers, h, c.num_heads, d_ff=h,
                               dropout=c.dropout, activation="gelu")
        self.gen = nn.Dense(c.vocab_size,
                            kernel_init=nn.initializers.xavier_uniform())

    def encode(self, batch, label: Optional[jnp.ndarray] = None,
               *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """(ref: ContextKnowledgeEncoder.forward, TMemNet/Model.py:54-98)"""
        c_ids, p_ids = batch["context"], batch["passage"]
        b, k, lp = p_ids.shape
        h = self.cfg.hidden_size
        c_keep = padding_mask(c_ids)
        ctx_enc = self.encoder(
            self.enc_pos(self.enc_embedding(c_ids), deterministic=deterministic),
            c_keep, deterministic=deterministic)
        p_flat = p_ids.reshape(b * k, lp)
        p_keep = padding_mask(p_flat)
        know_enc = self.encoder(
            self.enc_pos(self.enc_embedding(p_flat), deterministic=deterministic),
            p_keep, deterministic=deterministic)

        scale = jnp.sqrt(jnp.asarray(h, ctx_enc.dtype))
        ctx_use = masked_mean(ctx_enc, c_keep, sqrt=True) / scale
        know_use = masked_mean(know_enc, p_keep, sqrt=True).reshape(b, k, h) / scale
        ck_attn = jnp.einsum("bkh,bh->bk", know_use, ctx_use)

        cs = jnp.argmax(ck_attn, axis=-1) if label is None else label
        know_enc = know_enc.reshape(b, k, lp, h)
        p_keep = p_keep.reshape(b, k, lp)
        cs_enc = jnp.take_along_axis(know_enc, cs[:, None, None, None], axis=1)[:, 0]
        cs_keep = jnp.take_along_axis(p_keep, cs[:, None, None], axis=1)[:, 0]

        memory = jnp.concatenate([cs_enc, ctx_enc], axis=1)
        mem_keep = jnp.concatenate([cs_keep, c_keep], axis=1)
        cross_kv = self.decoder.precompute_memory(memory)
        init_state = {
            "cache": self.decoder.init_cache(b, self.cfg.max_dec_len + 1,
                                             memory.dtype),
            "hist": jnp.zeros((b, self.cfg.max_dec_len + 1), bool),
            "t": jnp.zeros((b, 1), jnp.int32),
        }
        return {"memory": memory, "mem_keep": mem_keep, "ck_attn": ck_attn,
                "cross_kv": cross_kv, "init_state": init_state}

    def decode_step(self, enc, state, prev_ids, *, deterministic: bool = True,
                    per_row: bool = False):
        """Incremental decode (≡ re-encoding the grown prefix,
        TMemNet/Model.py:141-147, minus the recompute).

        ``per_row=True``: rows sit at independent absolute positions
        (continuous batching) — ``state['t']`` is read per row and the
        cache/hist writes become indexed scatters that drop out-of-range
        rows (ops/cache.write_step)."""
        from ..ops.cache import write_step

        t = state["t"][:, 0] if per_row else state["t"][0, 0]
        emb = self.dec_pos(self.dec_embedding(prev_ids[:, None]), offset=t,
                           deterministic=True)
        hist = write_step(state["hist"], (prev_ids != 0)[:, None], t)
        y, cache = self.decoder.step(emb, t, state["cache"], enc["cross_kv"],
                                     hist, enc["mem_keep"])
        logits = self.gen(y[:, 0])
        new_state = {"cache": cache, "hist": hist, "t": state["t"] + 1}
        return logits, new_state

    def train_losses(self, batch, *, deterministic: bool = False,
                     mode: str = "train"):
        """(ref: TMemNet/Model.py:161-183; mode='ps_train' returns the
        unscaled selection loss only, Model.py:176-183)"""
        resp = batch["response"]
        b, t = resp.shape
        enc = self.encode(batch, label=batch["passage_label"],
                          deterministic=deterministic)
        if mode == "ps_train":
            label_1h = one_hot_labels(batch["passage_label"],
                                      enc["ck_attn"].shape[-1])
            return {"select": bce_with_logits(enc["ck_attn"], label_1h,
                                              batch.get("sample_weight"))}
        bos = jnp.full((b, 1), self.cfg.bos_id, resp.dtype)
        pad = jnp.zeros((b, 1), resp.dtype)
        tgt_in = jnp.concatenate([bos, resp], axis=1)       # [B, T+1]
        tgt_out = jnp.concatenate([resp, pad], axis=1)
        emb = self.dec_pos(self.dec_embedding(tgt_in), deterministic=deterministic)
        out = self.decoder(emb, enc["memory"], padding_mask(tgt_in),
                           enc["mem_keep"], deterministic=deterministic)
        logits = self.gen(out)
        w = batch.get("sample_weight")
        label_1h = one_hot_labels(batch["passage_label"], enc["ck_attn"].shape[-1])
        loss_s = 0.25 * bce_with_logits(enc["ck_attn"], label_1h, w)
        loss_g = cross_entropy(logits, tgt_out, w)
        return {"select": loss_s, "gen": loss_g}

    def rank(self, batch, *, deterministic: bool = True):
        return self.encode(batch, deterministic=deterministic)["ck_attn"]

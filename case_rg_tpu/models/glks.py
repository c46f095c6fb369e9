"""GLKS — Global-to-Local Knowledge Selection.

TPU-native rebuild of GLKS/Model.py:6-279 + GLKS/EncDecModel.py. Components:

* GenEncoder (1-layer bi-GRU with embedding dropout) for background/context
  (GLKS/Model.py:6-34) -> models/components.GRUSeqEncoder;
* KnowledgeSelector: highway-transformed matching matrix, per-token max score,
  sliding-window segment attention pooled by the context state
  (GLKS/Model.py:36-85). Window gathering uses a static index matrix instead
  of torch ``unfold`` so XLA emits one gather;
* StateTracker GRU, Copy/Vocab generators, sigmoid Mixturer
  (GLKS/Model.py:87-147);
* losses selected by method substrings 'mle'/'mce'/'ds'
  (GLKS/Model.py:264-279), default method 'ds_mle_mce_train'
  (GLKS/Run.py:32).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..ops.bilinear import BilinearAttention
from ..ops.copynet import copy_scatter
from ..ops.embedding import Embedding
from ..ops.gru import GRU
from ..ops.highway import Highway
from ..ops.masking import neg_inf
from .base import register_model
from .components import GRUSeqEncoder
from ..ops.dropout import Dropout


def _window_starts(length: int, size: int, step: int) -> jnp.ndarray:
    n = (length - size) // step + 1
    return jnp.arange(max(n, 0)) * step


class KnowledgeSelector(nn.Module):
    hidden_size: int
    min_window_size: int = 5
    n_windows: int = 4

    def setup(self):
        h = self.hidden_size
        self.b_highway = Highway(2 * h, 2 * h, num_layers=2)
        self.c_highway = Highway(2 * h, 2 * h, num_layers=2)
        self.match_attn = BilinearAttention(2 * h, 2 * h, 2 * h)
        self.area_attn = BilinearAttention(h, h, h)

    def match(self, b_out, c_out, c_state, b_keep, c_keep):
        """Per-background-token max matching score (GLKS/Model.py:47-58)."""
        lb, lc = b_out.shape[1], c_out.shape[1]
        b_h = self.b_highway(jnp.concatenate(
            [b_out, jnp.broadcast_to(c_state, (c_state.shape[0], lb, c_state.shape[-1]))], -1))
        c_h = self.c_highway(jnp.concatenate(
            [c_out, jnp.broadcast_to(c_state, (c_state.shape[0], lc, c_state.shape[-1]))], -1))
        m = self.match_attn.matching(b_h, c_h)             # [B, Lb, Lc]
        m = jnp.where(c_keep[:, None, :], m, neg_inf(m.dtype))
        m = jnp.where(b_keep[:, :, None], m, 0.0)
        return jnp.max(m, axis=-1)                          # [B, Lb]

    def segments(self, b_out, b_score, c_state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Window pooling (GLKS/Model.py:60-75)."""
        segs, scores = [], []
        size = self.min_window_size
        lb = b_out.shape[1]
        for _ in range(self.n_windows):
            starts = _window_starts(lb, size, self.min_window_size)
            idx = starts[:, None] + jnp.arange(size)[None, :]    # [n_w, ws]
            windows = b_out[:, idx]                               # [B, n_w, ws, H]
            ctx, _, _ = self.area_attn(c_state[:, None, None, :], windows, windows)
            segs.append(ctx[:, :, 0])                             # [B, n_w, H]
            scores.append(jnp.sum(b_score[:, idx], axis=-1))      # [B, n_w]
            size += self.min_window_size
        return jnp.concatenate(segs, 1), jnp.concatenate(scores, 1)

    def __call__(self, b_out, c_out, c_state_1, b_keep, c_keep):
        """c_state_1: [B, 1, H]. Returns (segment [B, 1, H], p_s [B, W],
        b_score [B, Lb]) (GLKS/Model.py:77-85)."""
        c_state = c_state_1[:, 0]
        b_score = self.match(b_out, c_out, c_state_1, b_keep, c_keep)
        segs, s_score = self.segments(b_out, b_score, c_state)
        p_s = jax.nn.softmax(s_score, axis=-1)
        segment = jnp.einsum("bw,bwh->bh", p_s, segs)[:, None, :]
        return segment, p_s, b_score


@register_model("glks")
class GLKSModel(nn.Module):
    cfg: ModelConfig
    STEP_EMITS_PROBS = True

    def setup(self):
        c = self.cfg
        e, h, v = c.embedding_size, c.hidden_size, c.vocab_size
        init = nn.initializers.xavier_uniform()
        self.b_encoder = GRUSeqEncoder(1, v, e, h, dropout=0.5,
                                       share_embedding_per_layer=False)
        self.c_encoder = GRUSeqEncoder(1, v, e, h, dropout=0.5,
                                       share_embedding_per_layer=False)
        self.embedding = Embedding(v, e)
        self.emb_drop = Dropout(0.5)
        self.k_selector = KnowledgeSelector(h, c.min_window_size, c.num_windows)
        # StateTracker (GLKS/Model.py:122-133)
        self.st_linear = nn.Dense(h, kernel_init=init)
        self.st_gru = GRU(input_size=e, hidden_size=h, num_layers=1)
        # CopyGenerator (GLKS/Model.py:87-95)
        self.copy_attn = BilinearAttention(e + 2 * h, h, h)
        # VocabGenerator (GLKS/Model.py:97-120)
        self.vg_c_attn = BilinearAttention(e + 2 * h, h, h)
        self.vg_b_attn = BilinearAttention(e + 2 * h, h, h)
        self.vg_readout = nn.Dense(h, kernel_init=init)
        self.vg_generator = nn.Dense(v, kernel_init=init)
        # Mixturer (GLKS/Model.py:135-147)
        self.mix_linear = nn.Dense(1, kernel_init=init)

    def encode(self, batch, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        b_ids, c_ids = batch["background"], batch["context"]
        b_outs, b_states = self.b_encoder(b_ids, deterministic=deterministic)
        c_outs, c_states = self.c_encoder(c_ids, deterministic=deterministic)
        b_out, c_out = b_outs[:, -1], c_outs[:, -1]
        c_state = c_states[:, -1][:, None, :]
        b_keep, c_keep = b_ids != 0, c_ids != 0
        segment, p_s, b_score = self.k_selector(b_out, c_out, c_state, b_keep, c_keep)
        init_state = self.st_linear(jnp.concatenate([c_state, segment], -1))
        return {"b_out": b_out, "c_out": c_out, "b_keep": b_keep,
                "c_keep": c_keep, "segment": segment, "p_s": p_s,
                "background": b_ids, "init_state": init_state,
                # key projections hoisted out of the decode/train scans
                "copy_b_uh": self.copy_attn.key_proj(b_out),
                "vg_c_uh": self.vg_c_attn.key_proj(c_out),
                "vg_b_uh": self.vg_b_attn.key_proj(b_out)}

    def _generate(self, word_emb, state, enc) -> jnp.ndarray:
        """One-step mixture distribution [B, V]
        (decode+generate, GLKS/Model.py:219-239)."""
        logits, _, p_k, p_mix = self._generate_core(word_emb, state, enc)
        p_v = jax.nn.softmax(logits, axis=-1)
        copied = copy_scatter(p_k, enc["background"], self.cfg.vocab_size)
        return p_mix * p_v + (1.0 - p_mix) * copied

    def _generate_core(self, word_emb, state, enc):
        """(vocab logits [B, V], readout r [B, H] feeding the generator,
        copy attention p_k [B, Lb], mix gate p_mix [B, 1]);
        p_v == softmax(logits)."""
        seg = enc["segment"]
        q = jnp.concatenate([word_emb, state, seg], axis=-1)      # [B, 1, E+2H]
        from ..ops.masking import masked_softmax
        p_k_raw = self.copy_attn.matching_from_proj(q, enc["copy_b_uh"])
        p_k = masked_softmax(p_k_raw, enc["b_keep"][:, None, :])[:, 0]
        c_ctx, _, _ = self.vg_c_attn.attend_from_proj(
            q, enc["vg_c_uh"], enc["c_out"], mask=enc["c_keep"][:, None, :])
        b_ctx, _, _ = self.vg_b_attn.attend_from_proj(
            q, enc["vg_b_uh"], enc["b_out"], mask=enc["b_keep"][:, None, :])
        concat = jnp.concatenate([word_emb[:, 0], state[:, 0], seg[:, 0],
                                  c_ctx[:, 0], b_ctx[:, 0]], axis=-1)
        r = self.vg_readout(concat)
        logits = self.vg_generator(r)
        p_mix = jax.nn.sigmoid(self.mix_linear(state[:, 0]))       # [B, 1]
        return logits, r, p_k, p_mix

    def decode_step(self, enc, state, prev_ids, *, deterministic: bool = True):
        """state: [B, 1, H] (single-layer tracker GRU)."""
        emb = self.emb_drop(self.embedding(prev_ids), deterministic=deterministic)[:, None]
        _, state = self.st_gru.step(emb[:, 0], state)
        probs = self._generate(emb, state, enc)
        return probs, state

    def decode_step_parts(self, enc, state, prev_ids, *,
                          deterministic: bool = True):
        """Scatter-free step: (vocab mass [B, V], copy mass [B, Lb], state)
        with ``dist == vocab + scatter_add(copy, enc['background'])`` (the
        mix gate multiplies the copy attention BEFORE the scatter-sum —
        same value, ~1 ULP). The math spec for ``decode_step_fast``."""
        emb = self.emb_drop(self.embedding(prev_ids),
                            deterministic=deterministic)[:, None]
        _, state = self.st_gru.step(emb[:, 0], state)
        logits, _, p_k, p_mix = self._generate_core(emb, state, enc)
        return p_mix * jax.nn.softmax(logits, axis=-1), \
            (1.0 - p_mix) * p_k, state

    def prepare_fast_decode(self, enc):
        """Hoisted (step-invariant) gathered generator columns for the
        scatter-free greedy loop (kernels/copy_argmax)."""
        from ..kernels.copy_argmax import gather_weight_columns
        p = self.vg_generator.variables["params"]
        w_at, b_at = gather_weight_columns(p["kernel"].T, enc["background"],
                                           p["bias"])
        return {"w_at": w_at, "b_at": b_at}

    def decode_step_fast(self, enc, fast, state, prev_ids, *,
                         deterministic: bool = True):
        """(logits [B, V], logits-at-source-ids [B, Lb], vocab gate [B, 1],
        copy mass [B, Lb], state) for candidate_argmax_from_logits."""
        emb = self.emb_drop(self.embedding(prev_ids),
                            deterministic=deterministic)[:, None]
        _, state = self.st_gru.step(emb[:, 0], state)
        logits, r, p_k, p_mix = self._generate_core(emb, state, enc)
        l_at = jnp.einsum("bld,bd->bl", fast["w_at"],
                          r.astype(fast["w_at"].dtype)) + fast["b_at"]
        return logits, l_at, p_mix, (1.0 - p_mix) * p_k, state

    def train_losses(self, batch, *, deterministic: bool = False,
                     mode: str = "ds_mle_mce_train"):
        resp = batch["response"]
        b, t = resp.shape
        v = self.cfg.vocab_size
        bos = jnp.full((b, 1), self.cfg.bos_id, resp.dtype)
        inputs = jnp.concatenate([bos, resp[:, :-1]], axis=1)
        embs = self.emb_drop(self.embedding(inputs), deterministic=deterministic)
        enc = self.encode(batch, deterministic=deterministic)
        eps = 1e-10

        def body(state, xs):
            emb_t, resp_t = xs
            _, state = self.st_gru.step(emb_t, state)
            probs = self._generate(emb_t[:, None], state, enc)
            p_at = jnp.take_along_axis(probs, resp_t[:, None], axis=-1)[:, 0]
            q = (probs + eps) / jnp.sum(probs + eps, axis=-1, keepdims=True)
            entropy = -jnp.sum(q * jnp.log(q), axis=-1)
            return state, (p_at, entropy)

        if self.is_initializing():
            body(enc["init_state"], (embs[:, 0], resp[:, 0]))
        _, (p_at, entropy) = jax.lax.scan(
            body, enc["init_state"], (jnp.swapaxes(embs, 0, 1), resp.T))
        p_at, entropy = p_at.T, entropy.T   # [B, T]

        w = batch.get("sample_weight")
        w = jnp.ones((b,), jnp.float32) if w is None else w.astype(jnp.float32)
        losses: Dict[str, jnp.ndarray] = {}
        if "mle" in mode:
            tok_w = (resp != 0).astype(jnp.float32) * w[:, None]
            losses["mle"] = -jnp.sum(jnp.log(p_at + 1e-8) * tok_w) / \
                jnp.maximum(jnp.sum(tok_w), 1.0)
        if "mce" in mode:
            # 1 - 0.1 * mean entropy over all B*T rows (GLKS/Model.py:273)
            losses["mce"] = 1.0 - 0.1 * jnp.sum(entropy * w[:, None]) / \
                jnp.maximum(jnp.sum(w) * t, 1.0)
        if "ds" in mode:
            # batchmean KL(selection || p_s) (GLKS/Model.py:276)
            p_s = enc["p_s"] + 1e-10
            target = batch["selection"] + 1e-10
            kl = jnp.sum(target * (jnp.log(target) - jnp.log(p_s)), axis=-1)
            losses["ds"] = jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)
        return losses

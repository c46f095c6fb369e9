"""GRU cell and masked-scan sequence GRU.

TPU-native replacement for the reference's cuDNN GRUs driven through
``gru_forward``'s sort/pack/unpack dance (ref: common/Utils.py:319-342).
On TPU there is no packing: sequences stay fixed-shape and padding is handled
with a mask inside a ``lax.scan``:

* forward direction: at padded steps the hidden state passes through
  unchanged, so the final carry equals the state at each row's last valid
  token (= pack_padded final state);
* backward direction: the scan runs over the time-reversed sequence; because
  padding is on the right, the state stays at h0 until the first valid token,
  which matches processing only the valid suffix;
* outputs at padded steps are zeroed (= pad_packed zero fill).

Gate math matches ``torch.nn.GRU`` exactly (r/z/n gate order, the
``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))`` coupling). The
input-to-hidden projection for the whole sequence is hoisted out of the scan
into one large MXU matmul; only the recurrent half runs inside the scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def gru_gates(gx: jnp.ndarray, h: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray, hidden_size: int) -> jnp.ndarray:
    """Apply the recurrent half given precomputed input gates ``gx``."""
    hs = hidden_size
    gh = h @ w_hh + b_hh
    r = jax.nn.sigmoid(gx[..., :hs] + gh[..., :hs])
    z = jax.nn.sigmoid(gx[..., hs:2 * hs] + gh[..., hs:2 * hs])
    n = jnp.tanh(gx[..., 2 * hs:] + r * gh[..., 2 * hs:])
    return (1.0 - z) * n + z * h


class GRU(nn.Module):
    """Multi-layer, optionally bidirectional GRU over padded sequences.

    Mirrors ``torch.nn.GRU(batch_first=True)``: returns outputs [B, L, D*H]
    (both directions concatenated per position) and the final state
    [B, num_layers * D, H] laid out layer-major/direction-minor, matching the
    reference's ``state.transpose(0, 1)`` view (common/Utils.py:340-342).
    """

    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False

    def setup(self):
        dirs = 2 if self.bidirectional else 1
        init = nn.initializers.xavier_uniform()
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size * dirs
            for d in range(dirs):
                tag = f"l{layer}_d{d}"
                w_ih.append(self.param(f"w_ih_{tag}", init, (in_size, 3 * self.hidden_size)))
                w_hh.append(self.param(f"w_hh_{tag}", init, (self.hidden_size, 3 * self.hidden_size)))
                b_ih.append(self.param(f"b_ih_{tag}", nn.initializers.zeros, (3 * self.hidden_size,)))
                b_hh.append(self.param(f"b_hh_{tag}", nn.initializers.zeros, (3 * self.hidden_size,)))
        self._w_ih, self._w_hh, self._b_ih, self._b_hh = w_ih, w_hh, b_ih, b_hh

    def _scan_direction(self, idx: int, x: jnp.ndarray, mask: jnp.ndarray,
                        h0: jnp.ndarray, reverse: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w_hh, b_hh = self._w_hh[idx], self._b_hh[idx]
        hs = self.hidden_size
        gx = x @ self._w_ih[idx] + self._b_ih[idx]  # [B, L, 3H] — one MXU matmul
        if reverse:
            gx = jnp.flip(gx, axis=1)
            mask = jnp.flip(mask, axis=1)

        def body(h, inp):
            gx_t, m_t = inp
            h_new = gru_gates(gx_t, h, w_hh, b_hh, hs)
            m = m_t[:, None].astype(h.dtype)
            h = m * h_new + (1.0 - m) * h
            return h, m * h_new

        xs = (jnp.swapaxes(gx, 0, 1), jnp.swapaxes(mask, 0, 1))
        h_final, outs = jax.lax.scan(body, h0, xs)
        outs = jnp.swapaxes(outs, 0, 1)
        if reverse:
            outs = jnp.flip(outs, axis=1)
        return outs, h_final

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 h0: Optional[jnp.ndarray] = None):
        b, l, _ = x.shape
        dirs = 2 if self.bidirectional else 1
        if mask is None:
            mask = jnp.ones((b, l), dtype=bool)
        if h0 is None:
            h0 = jnp.zeros((b, self.num_layers * dirs, self.hidden_size), x.dtype)

        finals = []
        out = x
        for layer in range(self.num_layers):
            outs_dir = []
            for d in range(dirs):
                idx = layer * dirs + d
                o, hf = self._scan_direction(idx, out, mask, h0[:, idx], reverse=(d == 1))
                outs_dir.append(o)
                finals.append(hf)
            out = jnp.concatenate(outs_dir, axis=-1) if dirs == 2 else outs_dir[0]
        final = jnp.stack(finals, axis=1)  # [B, layers*dirs, H]
        return out, final

    def step(self, x_t: jnp.ndarray, h: jnp.ndarray):
        """Single decode step (unidirectional only).

        x_t: [B, In], h: [B, num_layers, H] -> (top-layer output [B, H],
        new state [B, num_layers, H]). Used by the stepwise GRU decoders
        (ref: common/GRUSeqEncoderDecoder.py:93-97, S2SA/Model.py:42).
        """
        assert not self.bidirectional
        new_h = []
        out = x_t
        for layer in range(self.num_layers):
            gx = out @ self._w_ih[layer] + self._b_ih[layer]
            h_l = gru_gates(gx, h[:, layer], self._w_hh[layer], self._b_hh[layer],
                            self.hidden_size)
            new_h.append(h_l)
            out = h_l
        return out, jnp.stack(new_h, axis=1)

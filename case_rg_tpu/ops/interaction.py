"""Dual (BiDAF-style) query<->passage interaction.

TPU-native rebuild of common/Interaction.py:5-75. The reference materializes
the [B*n, Lp, Lq, 3D] concatenation before its scoring linear
(Interaction.py:32-36) — hundreds of MB per batch. Here the trilinear score
is decomposed::

    U[l, m] = Ep[l] . w_p  +  Eq[m] . w_q  +  (Ep[l] * w_x) . Eq[m]

so the only O(Lp*Lq) tensor is U itself and the heavy term is a single MXU
matmul. The three weight vectors are slices of the same [3D, 1] kernel, so
parameters correspond 1:1 with the reference's ``dual_att_linear``
(order: [w_q; w_p; w_x] to match the cat([E_q, E_p, E_q*E_p]) layout).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .masking import masked_softmax, neg_inf


class Interaction(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, enc1: jnp.ndarray, enc2: jnp.ndarray,
                 mask1: jnp.ndarray, mask2: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """enc1 (query): [B, nq, Lq, D]; enc2 (passage): [B, np, Lp, D];
        masks boolean [B, n, L]. Returns (G_p_q [B, nq, Lq, 5D],
        G_q_p [B, np, Lp, 5D]) as in Interaction.py:65-75."""
        b, nq, lq, d = enc1.shape
        _, np_, lp, _ = enc2.shape
        w = self.param("dual_att_kernel", nn.initializers.xavier_uniform(),
                       (3 * d, 1))[:, 0]
        w_q, w_p, w_x = w[:d], w[d:2 * d], w[2 * d:]

        if nq != np_:
            assert nq == 1, "query side must have one sequence or match passages"
            e_q = jnp.broadcast_to(enc1, (b, np_, lq, d))
            m_q = jnp.broadcast_to(mask1, (b, np_, lq))
        else:
            e_q, m_q = enc1, mask1
        e_p, m_p = enc2, mask2

        # U: [B, n, Lp, Lq]
        u = (jnp.einsum("bnpd,d->bnp", e_p, w_p)[..., :, None]
             + jnp.einsum("bnqd,d->bnq", e_q, w_q)[..., None, :]
             + jnp.einsum("bnpd,bnqd->bnpq", e_p * w_x, e_q))
        pair_mask = m_p[..., :, None] & m_q[..., None, :]

        a_p = masked_softmax(u, pair_mask, axis=3)   # over query positions
        b_p = masked_softmax(u, pair_mask, axis=2)   # over passage positions

        a1 = jnp.einsum("bnpq,bnqd->bnpd", a_p, e_q)          # A'_p  [.., Lp, D]
        b1 = jnp.einsum("bnpq,bnpd->bnqd", b_p, e_p)          # B'_p  [.., Lq, D]
        a2 = jnp.einsum("bnpq,bnqd->bnpd", a_p, b1)           # A''_p [.., Lp, D]
        b2 = jnp.einsum("bnpq,bnpd->bnqd", b_p, a1)           # B''_p [.., Lq, D]

        g_q_p = jnp.concatenate([e_p, a1, a2, e_p * a1, e_p * a2], axis=-1)
        g_p_q = jnp.concatenate([e_q, b1, b2, e_q * b1, e_q * b2], axis=-1)

        g_q_p = jnp.where(m_p[..., None], g_q_p, 0.0)
        g_p_q = jnp.where(m_q[..., None], g_p_q, 0.0)

        if nq != np_:
            g_p_q = jnp.max(g_p_q, axis=1, keepdims=True)
        return g_p_q, g_q_p

"""GRU parity vs torch.nn.GRU with packed variable-length sequences.

Covers the semantics of the reference's ``gru_forward`` wrapper
(common/Utils.py:319-342): sorted packing, zero-filled padded outputs and
per-row final states must all be reproduced by the masked scan.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

from case_rg_tpu.ops.gru import GRU
from torch_helpers import gru_params


def _torch_packed(gru, x, lengths):
    """Reference semantics: pack -> gru -> unpack (zero fill)."""
    lengths_t = torch.tensor(lengths)
    order = torch.argsort(lengths_t, descending=True, stable=True)
    inv = torch.argsort(order, stable=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x)[order], lengths_t[order], batch_first=True)
    out, state = gru(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=x.shape[1])
    out = out[inv]
    state = state.transpose(0, 1)[inv]  # [B, layers*dirs, H]
    return out.detach().numpy(), state.detach().numpy()


@pytest.mark.parametrize("bidirectional,num_layers", [(False, 1), (True, 1),
                                                      (False, 3), (True, 2)])
def test_gru_matches_torch_packed(bidirectional, num_layers):
    torch.manual_seed(0)
    in_size, hidden, b, l = 12, 16, 4, 9
    t_gru = torch.nn.GRU(in_size, hidden, num_layers=num_layers,
                         bidirectional=bidirectional, batch_first=True)
    rng = np.random.RandomState(0)
    x = rng.randn(b, l, in_size).astype(np.float32)
    lengths = np.array([9, 5, 1, 7])
    ref_out, ref_state = _torch_packed(t_gru, x, lengths)

    gru = GRU(input_size=in_size, hidden_size=hidden, num_layers=num_layers,
              bidirectional=bidirectional)
    params = {"params": gru_params(t_gru, num_layers, bidirectional)}
    mask = np.arange(l)[None, :] < lengths[:, None]
    out, state = gru.apply(params, jnp.array(x), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-5)
    np.testing.assert_allclose(np.asarray(state), ref_state, atol=3e-5)


def test_gru_step_matches_full_scan():
    torch.manual_seed(1)
    in_size, hidden, b, l, layers = 8, 10, 3, 6, 2
    t_gru = torch.nn.GRU(in_size, hidden, num_layers=layers, batch_first=True)
    gru = GRU(input_size=in_size, hidden_size=hidden, num_layers=layers)
    params = {"params": gru_params(t_gru, layers, False)}
    rng = np.random.RandomState(1)
    x = rng.randn(b, l, in_size).astype(np.float32)

    full_out, _ = gru.apply(params, jnp.array(x))
    h = jnp.zeros((b, layers, hidden))
    step_outs = []
    for t in range(l):
        o, h = gru.apply(params, jnp.array(x[:, t]), h, method=GRU.step)
        step_outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(step_outs, 1), np.asarray(full_out), atol=1e-5)


def test_gru_with_initial_state():
    torch.manual_seed(2)
    in_size, hidden, b, l = 6, 8, 2, 5
    t_gru = torch.nn.GRU(in_size, hidden, num_layers=1, batch_first=True)
    rng = np.random.RandomState(2)
    x = rng.randn(b, l, in_size).astype(np.float32)
    h0 = rng.randn(1, b, hidden).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_state = t_gru(torch.tensor(x), torch.tensor(h0))
    gru = GRU(input_size=in_size, hidden_size=hidden)
    params = {"params": gru_params(t_gru, 1, False)}
    out, state = gru.apply(params, jnp.array(x), None,
                           jnp.array(h0.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(state)[:, 0], ref_state.numpy()[0], atol=2e-5)

"""Helpers to convert torch module weights into case_rg_tpu param pytrees.

Used only by the parity tests: we instantiate torch built-ins
(nn.MultiheadAttention, nn.GRU, nn.LayerNorm, nn.Linear), copy their weights
into our Flax modules, and require numerical agreement.
"""

import numpy as np


def t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


def linear_params(torch_linear):
    p = {"kernel": t2n(torch_linear.weight).T}
    if torch_linear.bias is not None:
        p["bias"] = t2n(torch_linear.bias)
    return p


def mha_params(torch_mha):
    return {
        "qkv_kernel": t2n(torch_mha.in_proj_weight).T,
        "qkv_bias": t2n(torch_mha.in_proj_bias),
        "out": linear_params(torch_mha.out_proj),
    }


def layernorm_params(torch_ln):
    return {"scale": t2n(torch_ln.weight), "bias": t2n(torch_ln.bias)}


def gru_params(torch_gru, num_layers, bidirectional):
    out = {}
    dirs = 2 if bidirectional else 1
    for layer in range(num_layers):
        for d in range(dirs):
            suffix = f"l{layer}" + ("_reverse" if d == 1 else "")
            tag = f"l{layer}_d{d}"
            out[f"w_ih_{tag}"] = t2n(getattr(torch_gru, f"weight_ih_{suffix}")).T
            out[f"w_hh_{tag}"] = t2n(getattr(torch_gru, f"weight_hh_{suffix}")).T
            out[f"b_ih_{tag}"] = t2n(getattr(torch_gru, f"bias_ih_{suffix}"))
            out[f"b_hh_{tag}"] = t2n(getattr(torch_gru, f"bias_hh_{suffix}"))
    return out

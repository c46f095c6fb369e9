"""Highway network (ref: common/Highway.py:5-36).

x <- sigma(G x) * f(N x) + (1 - sigma(G x)) * (L x), repeated num_layers
times; f defaults to tanh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class Highway(nn.Module):
    input_size: int
    output_size: int
    num_layers: int = 1
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = jnp.tanh if self.activation == "tanh" else jax.nn.relu
        init = nn.initializers.xavier_uniform()
        for i in range(self.num_layers):
            gate = jax.nn.sigmoid(
                nn.Dense(self.output_size, kernel_init=init, name=f"gate{i}")(x))
            nonlin = f(nn.Dense(self.output_size, kernel_init=init, name=f"nonlinear{i}")(x))
            lin = nn.Dense(self.output_size, kernel_init=init, name=f"linear{i}")(x)
            x = gate * nonlin + (1.0 - gate) * lin
        return x

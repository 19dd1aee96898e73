"""Convolutional GRU cell (reference ltr/models/kys/conv_gru.py ConvGRUCell:6)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvGRUCell(nn.Module):
    hidden_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, state):
        """x (B, H, W, Cin), state (B, H, W, hidden) -> new state."""
        k = self.kernel_size
        pad = [(k // 2, k // 2)] * 2
        xs = jnp.concatenate([x, state], axis=-1)
        reset = jax.nn.sigmoid(nn.Conv(self.hidden_dim, (k, k), padding=pad,
                                       name="conv_reset")(xs))
        update = jax.nn.sigmoid(nn.Conv(self.hidden_dim, (k, k), padding=pad,
                                        name="conv_update")(xs))
        xs_reset = jnp.concatenate([x, reset * state], axis=-1)
        state_new = jnp.tanh(nn.Conv(self.hidden_dim, (k, k), padding=pad,
                                     name="conv_state_new")(xs_reset))
        return (1.0 - update) * state + update * state_new

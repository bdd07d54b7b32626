"""Toy MLP score networks (reference diffsci/models/nets/mlp.py:4-121).

Score-network calling convention across this framework:
``model(x, t, y=None, train=False)`` where t is the (preconditioned) noise
conditioner [B].
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class MLPUncond(nn.Module):
    """Unconditional MLP: concat(x, t) -> hidden stack -> dim."""
    dim: int
    hidden_dims: Sequence[int] = (10,)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        if t is None:
            t = jnp.zeros((x.shape[0],), x.dtype)
        h = jnp.concatenate([x, t[..., None]], axis=-1)
        for hd in self.hidden_dims:
            h = nn.Dense(hd)(h)
            h = nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.dim)(h)

    def export_description(self):
        from diffsci_tpu.models.nets.describe import plain_module_description
        return plain_module_description(self, "mlp")


class MLPCond(nn.Module):
    """Conditional MLP: concat(x, t, y) -> hidden stack -> dim."""
    dim: int
    ydim: int
    hidden_dims: Sequence[int] = (10,)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        if t is None:
            t = jnp.zeros((x.shape[0],), x.dtype)
        if y is None:
            y = jnp.zeros(x.shape[:1] + (self.ydim,), x.dtype)
        if isinstance(y, dict):
            y = y["y"]
        y = jnp.broadcast_to(y, x.shape[:1] + y.shape[1:])
        h = jnp.concatenate([x, t[..., None], y], axis=-1)
        for hd in self.hidden_dims:
            h = nn.Dense(hd)(h)
            h = nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.dim)(h)

    def export_description(self):
        from diffsci_tpu.models.nets.describe import plain_module_description
        return plain_module_description(self, "mlp_cond")

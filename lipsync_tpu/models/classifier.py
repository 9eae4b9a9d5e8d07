"""MLP classification head emitting a single logit for P(REAL).

Re-design of `/root/reference/app/models/classifier.py:4-34`:
Linear -> GELU -> Dropout -> LayerNorm -> Linear(1).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lipsync_tpu.models.layers import gelu_exact


class ClassificationHead(nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = gelu_exact(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(1, dtype=self.dtype, name="fc2")(h)
        return jnp.squeeze(h, axis=-1)

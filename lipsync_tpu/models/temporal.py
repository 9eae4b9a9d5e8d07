"""Multi-scale temporal transformer with CLS aggregation.

Re-design of `/root/reference/app/models/temporal.py:7-111`: parallel
Conv1d branches (k=3 micro-lip, k=5 phoneme, k=7 syllable) + BN + GELU,
concatenated and projected back to the embedding dim with a residual add;
a learnable CLS token is prepended and a 4-layer pre-norm transformer
encoder runs over the (1+T)-token sequence; the CLS output is returned.

Sequence length is tiny (33 tokens) so the whole encoder fuses into a
handful of MXU matmuls under XLA.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lipsync_tpu.models.layers import (
    TransformerEncoderLayer,
    gelu_exact,
)


class TemporalTransformer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.1
    pre_conv: bool = True
    multi_scale_pre_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        b, t, d = x.shape
        train = not deterministic

        if self.pre_conv and self.multi_scale_pre_conv:
            branches = []
            for k in (3, 5, 7):
                h = nn.Conv(
                    self.embed_dim,
                    kernel_size=(k,),
                    padding=((k // 2, k // 2),),
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"branch_k{k}_conv",
                )(x)
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"branch_k{k}_bn",
                )(h)
                branches.append(gelu_exact(h))
            x_conv = jnp.concatenate(branches, axis=-1)  # (B, T, 3D)
            x_conv = nn.Dense(
                self.embed_dim, dtype=self.dtype, name="pre_scale_proj"
            )(x_conv)
            x = x + x_conv

        cls = self.param(
            "cls_token",
            nn.initializers.normal(stddev=0.02),
            (1, 1, self.embed_dim),
        ).astype(self.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], axis=1
        )

        for i in range(self.num_layers):
            tokens = TransformerEncoderLayer(
                self.embed_dim,
                self.num_heads,
                ff_dim=self.embed_dim * 4,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(tokens, deterministic=deterministic)

        return tokens[:, 0]


def temporal_aggregation(x, lengths=None):
    """Masked global-average pooling over time (temporal.py:114-167).

    The reference ships this as a legacy ``TemporalAggregation`` nn.Module
    that ``LipSyncModel`` never instantiates (the CLS token above replaced
    it). It carries no parameters, so the TPU-native port is a pure
    function: mean over axis 1, or a masked mean when ``lengths`` gives
    per-sequence valid lengths (padded steps ``t >= lengths[b]`` ignored,
    zero-length rows clamped to avoid division by zero).

    Args:
        x: ``(B, T, D)`` fused features.
        lengths: optional ``(B,)`` int array of valid lengths.

    Returns:
        ``(B, D)`` pooled features.
    """
    if x.ndim != 3:
        raise ValueError(
            f"temporal_aggregation expects (B, T, D), got {x.shape}"
        )
    if lengths is None:
        return jnp.mean(x, axis=1)
    lengths = jnp.asarray(lengths)
    if lengths.ndim != 1 or lengths.shape[0] != x.shape[0]:
        raise ValueError("lengths must be (B,) and match the batch size")
    mask = (
        jnp.arange(x.shape[1])[None, :] < lengths[:, None]
    ).astype(x.dtype)[..., None]
    denom = jnp.maximum(lengths, 1).astype(x.dtype)[:, None]
    return jnp.sum(x * mask, axis=1) / denom

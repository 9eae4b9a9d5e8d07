"""3D-ResNet visual encoder over mouth-crop clips, TPU channels-last.

Re-design of `/root/reference/app/models/visual_encoder.py:90-202`:
stem Conv3d 3->64 k(3,7,7) s(1,2,2) + MaxPool (1,3,3)/(1,2,2), four residual
stages 64->64->128->256->feature_dim with spatial-only strides (temporal
resolution is preserved end-to-end for lip-sync timing), spatial-only global
average pooling.

Layout: input ``(B, T, H, W, 3)``; pooled output ``(B, T, D)`` (time-major —
the reference's ``(B, D, T)`` transposed away); feature map
``(B, T, H', W', D)``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lipsync_tpu.models.layers import ConvBNAct, ResidualBlockND, max_pool_same


class VisualEncoder(nn.Module):
    feature_dim: int = 256
    base_channels: int = 64
    dropout: float = 0.1
    dtype: Any = jnp.float32
    conv_lowering: str = "conv"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        return_map: bool = False,
    ):
        if x.ndim != 5:
            raise ValueError(
                f"VisualEncoder expects (B, T, H, W, 3), got {x.shape}"
            )
        c = self.base_channels
        # Stem: moderate temporal kernel, stronger spatial stride.
        out = ConvBNAct(
            c,
            kernel_size=(3, 7, 7),
            strides=(1, 2, 2),
            padding=((1, 1), (3, 3), (3, 3)),
            dtype=self.dtype,
            lowering=self.conv_lowering,
            name="stem",
        )(x, train=train)
        out = max_pool_same(out, (1, 3, 3), (1, 2, 2), ((0, 0), (1, 1), (1, 1)))

        block = lambda f, s, name: ResidualBlockND(
            f, kernel_size=(3, 3, 3), strides=s, dtype=self.dtype,
            lowering=self.conv_lowering, name=name,
        )
        out = block(c, (1, 1, 1), "layer1")(out, train=train)
        out = block(c * 2, (1, 2, 2), "layer2")(out, train=train)
        out = block(c * 4, (1, 2, 2), "layer3")(out, train=train)
        out = block(self.feature_dim, (1, 2, 2), "layer4")(out, train=train)

        if self.dropout > 0.0 and train:
            # torch Dropout3d drops whole channels; channels-last -> mask last axis.
            out = nn.Dropout(
                rate=self.dropout,
                broadcast_dims=(1, 2, 3),
                deterministic=False,
            )(out)

        feature_map = out  # (B, T, H', W', D)
        pooled = jnp.mean(out, axis=(2, 3))  # (B, T, D)
        if return_map:
            return pooled, feature_map
        return pooled

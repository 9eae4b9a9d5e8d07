"""2D-ResNet encoder over log-mel spectrograms, TPU channels-last.

Re-design of `/root/reference/app/models/audio_encoder.py:92-206`:
stem Conv2d 1->64 k7 s(2,2) + MaxPool k3 s2, stages with frequency-heavy
strides; ``preserve_audio_temporal`` selects layer3 stride (2,1) (keep more
time) vs (2,2); frequency-only global average pooling.

Layout: input ``(B, F, T, 1)``; output ``(B, T', D)`` time-major.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lipsync_tpu.models.layers import ConvBNAct, ResidualBlockND, max_pool_same


class AudioEncoder(nn.Module):
    feature_dim: int = 256
    base_channels: int = 64
    dropout: float = 0.1
    preserve_audio_temporal: bool = True
    dtype: Any = jnp.float32
    conv_lowering: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(f"AudioEncoder expects (B, F, T, 1), got {x.shape}")
        c = self.base_channels
        out = ConvBNAct(
            c,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dtype=self.dtype,
            lowering=self.conv_lowering,
            name="stem",
        )(x, train=train)
        out = max_pool_same(out, (3, 3), (2, 2), ((1, 1), (1, 1)))

        block = lambda f, s, name: ResidualBlockND(
            f, kernel_size=(3, 3), strides=s, dtype=self.dtype,
            lowering=self.conv_lowering, name=name,
        )
        layer3_stride = (2, 1) if self.preserve_audio_temporal else (2, 2)
        out = block(c, (1, 1), "layer1")(out, train=train)
        out = block(c * 2, (2, 2), "layer2")(out, train=train)
        out = block(c * 4, layer3_stride, "layer3")(out, train=train)
        out = block(self.feature_dim, (2, 1), "layer4")(out, train=train)

        if self.dropout > 0.0 and train:
            out = nn.Dropout(rate=self.dropout, deterministic=False)(out)

        # Pool over frequency only; preserve temporal resolution.
        return jnp.mean(out, axis=1)  # (B, T', D)

"""Feature projection + bidirectional gated cross-modal attention.

Re-design of `/root/reference/app/models/fusion_module.py:7-124`:
both modalities are projected to a shared embedding, audio is linearly
interpolated to the visual token rate when lengths differ, video attends
to audio and audio to video, and a per-token sigmoid gate blends the two
attended streams before a final Linear+ReLU fuse.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lipsync_tpu.models.layers import (
    MultiHeadAttention,
    gelu_exact,
    interp_linear_time,
)


class FeatureProjection(nn.Module):
    """Per-modality Linear to a shared embedding (fusion_module.py:90-124).

    Inputs/outputs are time-major ``(B, T, D)`` so no transposes are needed.
    """

    embed_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, visual_feat: jnp.ndarray, audio_feat: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="visual_proj")(
            visual_feat
        )
        a = nn.Dense(self.embed_dim, dtype=self.dtype, name="audio_proj")(
            audio_feat
        )
        return v, a


class CrossModalAttention(nn.Module):
    """Gated bidirectional cross-attention (fusion_module.py:7-87)."""

    embed_dim: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual_emb: jnp.ndarray,
        audio_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        t_v = visual_emb.shape[1]
        audio_emb = interp_linear_time(audio_emb, t_v)

        v_attended = MultiHeadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="v2a_attn",
        )(visual_emb, audio_emb, audio_emb, deterministic=deterministic)
        v_out = visual_emb + v_attended

        a_attended = MultiHeadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="a2v_attn",
        )(audio_emb, visual_emb, visual_emb, deterministic=deterministic)
        a_out = audio_emb + a_attended

        # Per-token modality gate: sigmoid(MLP([v_out, a_out])).
        gate_in = jnp.concatenate([v_out, a_out], axis=-1)
        g = nn.Dense(self.embed_dim, dtype=self.dtype, name="gate_fc1")(gate_in)
        g = gelu_exact(g)
        g = nn.Dense(1, dtype=self.dtype, name="gate_fc2")(g)
        g = nn.sigmoid(g)
        fused = g * v_out + (1.0 - g) * a_out

        fused = nn.Dense(self.embed_dim, dtype=self.dtype, name="fuse_fc")(fused)
        return nn.relu(fused)


class LegacyFusionModule(nn.Module):
    """Concat-then-MLP time-wise fusion (fusion_module.py:127-175).

    Kept for API parity with the reference, which ships this module but
    never wires it into ``LipSyncModel`` (the gated ``CrossModalAttention``
    above replaced it). Audio is linearly interpolated to the visual token
    rate when lengths differ, then each timestep's concatenated pair runs
    through Linear(2D→H)+ReLU+Linear(H→D)+ReLU.
    """

    embed_dim: int = 256
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, visual_emb: jnp.ndarray, audio_emb: jnp.ndarray
    ) -> jnp.ndarray:
        if visual_emb.ndim != 3 or audio_emb.ndim != 3:
            raise ValueError(
                "LegacyFusionModule expects (B, T, D) visual and audio inputs"
            )
        if (
            visual_emb.shape[0] != audio_emb.shape[0]
            or visual_emb.shape[2] != audio_emb.shape[2]
        ):
            raise ValueError(
                "visual_emb and audio_emb must share batch and feature dims"
            )
        audio_emb = interp_linear_time(audio_emb, visual_emb.shape[1])
        x = jnp.concatenate([visual_emb, audio_emb], axis=-1)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(x)
        return nn.relu(x)

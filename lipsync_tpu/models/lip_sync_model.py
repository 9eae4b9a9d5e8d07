"""End-to-end audio-visual lip-sync deepfake detection model.

Re-design of `/root/reference/app/models/lip_sync_model.py:14-145` as a
single flax module whose whole forward pass compiles into one fused XLA
program: visual 3D-ResNet + audio 2D-ResNet encoders, shared-embedding
projection, gated cross-modal attention, CLS temporal transformer, and the
artifact branch, concatenated into the classification head which emits a
logit for P(REAL).

Layouts (channels-last, TPU-native):
  visual: ``(B, T, H, W, 3)``  float in [0, 1]
  audio:  ``(B, F, T_a, 1)``   log-mel dB
Output: ``(B,)`` logits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from lipsync_tpu.models.artifact import ArtifactDetector
from lipsync_tpu.models.audio_encoder import AudioEncoder
from lipsync_tpu.models.classifier import ClassificationHead
from lipsync_tpu.models.fusion import CrossModalAttention, FeatureProjection
from lipsync_tpu.models.temporal import TemporalTransformer
from lipsync_tpu.models.visual_encoder import VisualEncoder


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters mirroring the reference ctor
    (lip_sync_model.py:26-39). Frozen/hashable so it can be a jit static."""

    visual_feature_dim: int = 256
    audio_feature_dim: int = 256
    embed_dim: int = 256
    detect_artifacts: bool = True
    cross_modal_heads: int = 8
    temporal_layers: int = 4
    temporal_heads: int = 8
    temporal_pre_conv: bool = True
    use_delta_artifact: bool = True
    use_high_freq_artifact: bool = True
    preserve_audio_temporal: bool = True
    dropout: float = 0.1

    # Canonical input geometry (BASELINE.md invariants).
    video_frames: int = 32
    crop_size: int = 96
    mel_bins: int = 80
    audio_frames: int = 128


class LipSyncModel(nn.Module):
    config: ModelConfig = ModelConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual: jnp.ndarray,
        audio: jnp.ndarray,
        train: bool = False,
        return_aux: bool = False,
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]:
        cfg = self.config
        deterministic = not train
        visual = visual.astype(self.dtype)
        audio = audio.astype(self.dtype)

        visual_encoder = VisualEncoder(
            feature_dim=cfg.visual_feature_dim,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="visual_encoder",
        )
        if cfg.detect_artifacts:
            v_feat, v_map = visual_encoder(visual, train=train, return_map=True)
        else:
            v_feat = visual_encoder(visual, train=train)
            v_map = None

        a_feat = AudioEncoder(
            feature_dim=cfg.audio_feature_dim,
            dropout=cfg.dropout,
            preserve_audio_temporal=cfg.preserve_audio_temporal,
            dtype=self.dtype,
            name="audio_encoder",
        )(audio, train=train)

        v_emb, a_emb = FeatureProjection(
            embed_dim=cfg.embed_dim, dtype=self.dtype, name="projection"
        )(v_feat, a_feat)

        fused = CrossModalAttention(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.cross_modal_heads,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="cross_modal",
        )(v_emb, a_emb, deterministic=deterministic)

        cls_output = TemporalTransformer(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.temporal_heads,
            num_layers=cfg.temporal_layers,
            dropout=cfg.dropout,
            pre_conv=cfg.temporal_pre_conv,
            dtype=self.dtype,
            name="temporal",
        )(fused, deterministic=deterministic)

        if cfg.detect_artifacts:
            artifact_feat = ArtifactDetector(
                visual_feature_dim=cfg.visual_feature_dim,
                embed_dim=cfg.embed_dim,
                use_delta_map=cfg.use_delta_artifact,
                use_high_freq=cfg.use_high_freq_artifact,
                dtype=self.dtype,
                name="artifact_detector",
            )(v_map, cls_output, raw_video=visual, train=train)
            combined = jnp.concatenate([cls_output, artifact_feat], axis=-1)
        else:
            combined = cls_output

        logits = ClassificationHead(
            hidden_dim=128,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="classifier",
        )(combined, deterministic=deterministic)
        logits = logits.astype(jnp.float32)

        if not return_aux:
            return logits
        aux = {
            "visual_tokens": v_emb,
            "audio_tokens": a_emb,
            "fused_tokens": fused,
            "cls_output": cls_output,
        }
        return logits, aux


def example_inputs(
    cfg: ModelConfig = ModelConfig(), batch: int = 1, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero inputs with the canonical shapes (for init / compile checks)."""
    visual = jnp.zeros(
        (batch, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3), dtype
    )
    audio = jnp.zeros((batch, cfg.mel_bins, cfg.audio_frames, 1), dtype)
    return visual, audio

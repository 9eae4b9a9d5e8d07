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

Beyond ``__call__`` (the reference-parity forward), the module exposes a
split surface for the long-video engine's shared-track encoding
(``ScoringEngine`` with ``shared_visual_encoding=True``):
``encode_visual`` runs the FLOP-dominant visual encoder once over a whole
track, and ``score_encoded`` runs everything after it on per-window
gathers of those features. With the reference's 75%-overlapping windows
(stride 8 of 32, video.py:547-569) this computes each frame's visual
features once instead of four times. Numerics: identical to ``__call__``
for a single-window track; for longer tracks, interior windows see real
neighboring frames instead of each window's zero temporal conv padding
(deviation measured in tests/BENCHMARKS.md — parity mode stays default).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

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
    # Encoder conv lowering: "conv" (XLA emitter, reference parity) or
    # "int8" (dynamic post-training quantization, inference only — the
    # MXU's int8 path peaks at 2x bf16 on v5e; see layers.Int8Conv).
    conv_lowering: str = "conv"
    # Serving lowering for the HF artifact stem: compose the (trainable)
    # Laplacian into conv1's kernel at trace time — one 3->32 conv instead
    # of two layout-bound 3-channel convs (A/B: scripts/bench_fold.py,
    # BENCHMARKS.md "HF-stem fold"). Same param tree; exact in the
    # strided interior, the border row/col deviates (artifact.py).
    hf_stem_fold: bool = False

    # Canonical input geometry (BASELINE.md invariants).
    video_frames: int = 32
    crop_size: int = 96
    mel_bins: int = 80
    audio_frames: int = 128


class LipSyncModel(nn.Module):
    config: ModelConfig = ModelConfig()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.visual_encoder = VisualEncoder(
            feature_dim=cfg.visual_feature_dim,
            dropout=cfg.dropout,
            dtype=self.dtype,
            conv_lowering=cfg.conv_lowering,
        )
        self.audio_encoder = AudioEncoder(
            feature_dim=cfg.audio_feature_dim,
            dropout=cfg.dropout,
            preserve_audio_temporal=cfg.preserve_audio_temporal,
            dtype=self.dtype,
            conv_lowering=cfg.conv_lowering,
        )
        self.projection = FeatureProjection(
            embed_dim=cfg.embed_dim, dtype=self.dtype
        )
        self.cross_modal = CrossModalAttention(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.cross_modal_heads,
            dropout=cfg.dropout,
            dtype=self.dtype,
        )
        self.temporal = TemporalTransformer(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.temporal_heads,
            num_layers=cfg.temporal_layers,
            dropout=cfg.dropout,
            pre_conv=cfg.temporal_pre_conv,
            dtype=self.dtype,
        )
        if cfg.detect_artifacts:
            self.artifact_detector = ArtifactDetector(
                visual_feature_dim=cfg.visual_feature_dim,
                embed_dim=cfg.embed_dim,
                use_delta_map=cfg.use_delta_artifact,
                use_high_freq=cfg.use_high_freq_artifact,
                dtype=self.dtype,
                fold_hf_stem=cfg.hf_stem_fold,
            )
        self.classifier = ClassificationHead(
            hidden_dim=128, dropout=cfg.dropout, dtype=self.dtype
        )

    def __call__(
        self,
        visual: jnp.ndarray,
        audio: jnp.ndarray,
        train: bool = False,
        return_aux: bool = False,
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]:
        visual = visual.astype(self.dtype)
        v_feat, v_map = self.encode_visual(visual, train=train)
        return self.score_encoded(
            v_feat, v_map, visual, audio, train=train, return_aux=return_aux
        )

    def encode_visual(
        self, visual: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Visual features for ``(B, T, H, W, 3)`` pixels:
        ``(pooled (B,T,D), feature_map (B,T,H',W',D) | None)``. T is NOT
        required to equal ``config.video_frames`` — the encoder has no
        temporal stride (reference visual_encoder.py:133-152), which is
        what makes whole-track encoding + per-window gathering possible."""
        visual = visual.astype(self.dtype)
        if self.config.detect_artifacts:
            return self.visual_encoder(visual, train=train, return_map=True)
        return self.visual_encoder(visual, train=train), None

    def score_encoded(
        self,
        v_feat: jnp.ndarray,
        v_map: Optional[jnp.ndarray],
        raw_visual: Optional[jnp.ndarray],
        audio: jnp.ndarray,
        train: bool = False,
        return_aux: bool = False,
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]:
        """Everything after the visual encoder: audio encoder, fusion,
        temporal transformer, artifact branch, head. ``raw_visual`` feeds
        the high-frequency artifact branch (ignored when
        ``detect_artifacts=False``)."""
        cfg = self.config
        deterministic = not train
        audio = audio.astype(self.dtype)

        a_feat = self.audio_encoder(audio, train=train)
        v_emb, a_emb = self.projection(v_feat, a_feat)
        fused = self.cross_modal(v_emb, a_emb, deterministic=deterministic)
        cls_output = self.temporal(fused, deterministic=deterministic)

        if cfg.detect_artifacts:
            artifact_feat = self.artifact_detector(
                v_map,
                cls_output,
                raw_video=raw_visual.astype(self.dtype),
                train=train,
            )
            combined = jnp.concatenate([cls_output, artifact_feat], axis=-1)
        else:
            combined = cls_output

        logits = self.classifier(combined, deterministic=deterministic)
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

"""Artifact detection branch (raw + delta + Laplacian high-frequency).

Re-design of `/root/reference/app/models/artifact_detector.py:14-183`:
1. Temporal-inconsistency detector: Conv3d D->D/2->D/4 (+BN+ReLU) over the
   visual feature map, global average pooled.
2. Delta branch: frame-difference of the feature map through the *same*
   detector weights.
3. High-frequency branch: fixed-init (but trainable) spatial Laplacian
   Conv2d per frame on the raw clip, then Conv3d 3->32->64 with spatial
   stride 2, global average pooled.
CLS(D) + concat(artifact features) -> MLP -> (B, D/2).

Layouts are channels-last: feature map ``(B, T, H, W, D)``, raw clip
``(B, T, H, W, 3)``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from lipsync_tpu.models.layers import ConvBNAct


def _laplacian_kernel_3ch() -> np.ndarray:
    """Per-channel spatial Laplacian, flax layout (kH, kW, in, out).

    Matches artifact_detector.py:14-21 (each output channel sees only its
    own input channel).
    """
    k = np.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], np.float32)
    w = np.zeros((3, 3, 3, 3), np.float32)
    for i in range(3):
        w[:, :, i, i] = k
    return w


class _ConvParams(nn.Module):
    """Declares ``nn.Conv``-compatible params (``kernel`` [+ ``bias``])
    without running the convolution.

    Lets an alternate lowering read the weights while keeping the param
    tree — names, shapes, init functions, and RNG paths — identical to the
    standard path, so checkpoints load either way (same contract as
    layers.Int8Conv / layers.ShiftMatmulConv)."""

    shape: Tuple[int, ...]
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.shape)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return kernel, bias


def _compose_spatial(lap_kernel: jnp.ndarray, conv_kernel: jnp.ndarray) -> jnp.ndarray:
    """Compose a per-frame 2D filter into the following 3D conv's kernel.

    For cross-correlations ``z = k2 * (k1 * x)`` (flax convs), the composed
    kernel is ``K[t, d] = sum_{a+b=d} k1[a] @ k2[t, b]`` over spatial taps
    — a (kh+bh-1, kw+bw-1) kernel whose single conv over ``x`` (with summed
    padding) equals the sequential pair everywhere except outputs whose
    receptive field touches the intermediate's zero-padding ring (verified
    exact to fp32 rounding in tests/test_ops.py). Runs in fp32 at trace
    time; ~200 kFLOPs, negligible per forward."""
    kh, kw = lap_kernel.shape[0], lap_kernel.shape[1]
    kt, bh, bw = conv_kernel.shape[0], conv_kernel.shape[1], conv_kernel.shape[2]
    k1 = lap_kernel.astype(jnp.float32)
    k2 = conv_kernel.astype(jnp.float32)
    out = jnp.zeros(
        (kt, kh + bh - 1, kw + bw - 1, lap_kernel.shape[2], conv_kernel.shape[-1]),
        jnp.float32,
    )
    for a in range(kh):
        for b in range(kw):
            out = out.at[:, a : a + bh, b : b + bw].add(
                jnp.einsum("im,tbcmo->tbcio", k1[a, b], k2)
            )
    return out


class _FoldedStemConvBN(nn.Module):
    """``conv1`` of the HF stem with the (trainable) Laplacian composed into
    its kernel at trace time — one 3->32 conv instead of two 3-channel convs.

    Param-compatible with ``ConvBNAct(features, k=(3,3,3))`` (paths
    ``conv/{kernel,bias}`` + ``bn/*``), so trained checkpoints swap between
    lowerings freely. Motivation: 3-channel convs are layout-bound on the
    TPU conv emitter (they pad toward the 128-lane tile), and the
    sequential pair also materializes a full-resolution 3-channel
    intermediate in HBM; the composed (3,5,5) kernel removes both at 225
    vs 81 contraction taps (A/B harness: scripts/bench_fold.py; measured
    numbers in BENCHMARKS.md "HF-stem fold"). Numerics: exact in the
    strided interior; the first/last output row/col see the composed
    kernel's implicit Laplacian border extension instead of the sequential
    path's zeroed ring (bounded end-to-end in tests/test_ops.py
    test_hf_stem_fold_model_logits_close).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, video: jnp.ndarray, lap_kernel: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        kernel, bias = _ConvParams(
            (3, 3, 3, video.shape[-1], self.features), use_bias=True, name="conv"
        )()
        composed = _compose_spatial(lap_kernel, kernel).astype(self.dtype)
        x = video.astype(self.dtype)
        dn = lax.conv_dimension_numbers(
            x.shape, composed.shape, ("NTHWC", "THWIO", "NTHWC")
        )
        out = lax.conv_general_dilated(
            x, composed, (1, 2, 2), ((1, 1), (2, 2), (2, 2)), dimension_numbers=dn
        )
        out = out + bias.astype(self.dtype)
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(out)
        return nn.relu(out)


class TemporalInconsistencyDetector(nn.Module):
    """Conv3d stack detecting flicker in visual features
    (artifact_detector.py:65-107)."""

    feature_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The input is the encoder feature map: T x 3 x 3 spatial. XLA's
        # conv emitter hits ~0.10 MFU on 3x3x3 kernels over a 3x3 map
        # (round-2 profile); shift_matmul lowering runs the same math as
        # 27 MXU matmuls (layers.ShiftMatmulConv — param-compatible).
        out = ConvBNAct(
            self.feature_dim // 2,
            kernel_size=(3, 3, 3),
            strides=(1, 1, 1),
            padding=((1, 1),) * 3,
            use_bias=True,
            dtype=self.dtype,
            lowering="shift_matmul",
            name="conv1",
        )(x, train=train)
        out = ConvBNAct(
            self.feature_dim // 4,
            kernel_size=(3, 3, 3),
            strides=(1, 1, 1),
            padding=((1, 1),) * 3,
            use_bias=True,
            dtype=self.dtype,
            lowering="shift_matmul",
            name="conv2",
        )(out, train=train)
        return jnp.mean(out, axis=(1, 2, 3))  # (B, D/4)


class HighFrequencyDetector(nn.Module):
    """Laplacian high-pass + Conv3d over the raw clip
    (artifact_detector.py:24-62)."""

    out_dim: int = 64
    dtype: Any = jnp.float32
    # Serving lowering: compose the Laplacian into conv1's kernel
    # (_FoldedStemConvBN) — same params, one conv instead of two. Exact in
    # the strided interior, border row/col deviates; opt-in like int8.
    fold_stem: bool = False

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = video.shape
        if self.fold_stem:
            lap_kernel, _ = _ConvParams(
                (3, 3, c, c),
                kernel_init=lambda *_: jnp.asarray(_laplacian_kernel_3ch()),
                name="laplacian",
            )()
            x = _FoldedStemConvBN(32, dtype=self.dtype, name="conv1")(
                video, lap_kernel, train=train
            )
        else:
            # Per-frame 2D Laplacian == one grouped-in-time conv: fold T
            # into batch.
            frames = video.reshape(b * t, h, w, c)
            lap = nn.Conv(
                3,
                kernel_size=(3, 3),
                padding=((1, 1), (1, 1)),
                use_bias=False,
                kernel_init=lambda *_: jnp.asarray(_laplacian_kernel_3ch()),
                dtype=self.dtype,
                name="laplacian",
            )(frames)
            x = lap.reshape(b, t, h, w, c)
            x = ConvBNAct(
                32,
                kernel_size=(3, 3, 3),
                strides=(1, 2, 2),
                padding=((1, 1),) * 3,
                use_bias=True,
                dtype=self.dtype,
                name="conv1",
            )(x, train=train)
        x = ConvBNAct(
            self.out_dim,
            kernel_size=(3, 3, 3),
            strides=(1, 2, 2),
            padding=((1, 1),) * 3,
            use_bias=True,
            dtype=self.dtype,
            name="conv2",
        )(x, train=train)
        return jnp.mean(x, axis=(1, 2, 3))  # (B, out_dim)


class ArtifactDetector(nn.Module):
    """Full artifact branch (artifact_detector.py:110-183)."""

    visual_feature_dim: int = 256
    embed_dim: int = 256
    use_delta_map: bool = True
    use_high_freq: bool = True
    high_freq_dim: int = 64
    dtype: Any = jnp.float32
    fold_hf_stem: bool = False

    @nn.compact
    def __call__(
        self,
        visual_features: jnp.ndarray,
        cls_output: jnp.ndarray,
        raw_video: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        detector = TemporalInconsistencyDetector(
            self.visual_feature_dim, dtype=self.dtype, name="temporal_detector"
        )
        artifact_feat = detector(visual_features, train=train)

        if self.use_delta_map:
            if visual_features.shape[1] > 1:
                delta = visual_features[:, 1:] - visual_features[:, :-1]
            else:
                delta = jnp.zeros_like(visual_features)
            delta_feat = detector(delta, train=train)  # shared weights
            artifact_feat = jnp.concatenate([artifact_feat, delta_feat], axis=-1)

        if self.use_high_freq and raw_video is not None:
            hf = HighFrequencyDetector(
                self.high_freq_dim,
                dtype=self.dtype,
                fold_stem=self.fold_hf_stem,
                name="high_freq_detector",
            )(raw_video, train=train)
            artifact_feat = jnp.concatenate([artifact_feat, hf], axis=-1)

        combined = jnp.concatenate([cls_output, artifact_feat], axis=-1)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="fusion_fc1")(combined)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim // 2, dtype=self.dtype, name="fusion_fc2")(h)
        return nn.relu(h)

"""Device-side batched training augmentations.

TPU-native re-design of the reference's per-sample host augmentation
(`/root/reference/app/training/augmentation.py:67-140`, re-implemented on
host in ``training/data.py:Augmentations``): the same shape-preserving
transforms — temporal speed warp on both modalities, horizontal flip,
rotation with reflected border, brightness/contrast jitter, Gaussian
noise — expressed as batched XLA ops that fuse INTO the jitted train step.

Why: the host loader runs on one CPU core and cv2-based augmentation costs
~18 ms/sample there (measured round 3); on device the whole batch
augments in microseconds inside the same program as the forward/backward,
so input-pipeline throughput no longer bounds training scale.

Semantics parity with the host path:
  * identical op ORDER and gating probabilities (each jitter applies with
    p=0.5 independently per sample; host applies per sample per batch);
  * speed warp uses the same truncating nearest-frame index map
    ``clip(linspace(0,t-1,t)*speed)`` on both modalities with one shared
    speed factor;
  * rotation matches cv2.warpAffine(BORDER_REFLECT) conventions: bilinear
    sampling, inverse mapping about the (w/2, h/2) center, reflected
    border with edge duplication;
  * value ranges: visual clipped to [0,1], audio dB clipped to [-80,0].

The host `Augmentations` class stays for single-sample / torch-parity
use; `augment_batch` is the production training path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Mirrors ``training.data.Augmentations`` knobs. Frozen/hashable so it
    can ride a jit closure."""

    speed_range: Tuple[float, float] = (0.9, 1.1)
    rotation_deg: float = 15.0
    brightness_range: Tuple[float, float] = (0.8, 1.2)
    contrast_range: Tuple[float, float] = (0.8, 1.2)
    visual_noise_std: float = 0.02
    audio_noise_std: float = 0.01
    enabled: bool = True


def _reflect_index(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Reflect-with-edge-duplication border (cv2 BORDER_REFLECT /
    scipy 'reflect'): ...dcba|abcd|dcba... Period 2n."""
    idx = jnp.mod(idx, 2 * n)
    idx = jnp.where(idx < 0, idx + 2 * n, idx)
    return jnp.where(idx < n, idx, 2 * n - 1 - idx)


def _speed_indices(t: int, speed: jnp.ndarray) -> jnp.ndarray:
    """Truncating nearest-index map of the host speed warp."""
    base = jnp.linspace(0.0, float(t - 1), t)
    return jnp.clip(base * speed, 0.0, float(t - 1)).astype(jnp.int32)


def _rotate_frames(frames: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate (T,H,W,C) by ``angle_deg`` about the (w/2, h/2) center with
    bilinear sampling and reflected border (cv2.warpAffine parity: the
    destination grid maps through the INVERSE rotation)."""
    t, h, w, c = frames.shape
    # cv2.getRotationMatrix2D(center, angle) rotates CCW for +angle with
    # y down; composing its inverse with our y-down grid works out to a
    # +angle rotation of destination coordinates (verified to 2e-6
    # against warpAffine in tests).
    theta = angle_deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = h / 2.0, w / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx, dy = xx - cx, yy - cy
    sx = cos * dx - sin * dy + cx
    sy = sin * dx + cos * dy + cy
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[None, :, :, None]
    wy = (sy - y0)[None, :, :, None]

    def gather(yi, xi):
        yi = _reflect_index(yi.astype(jnp.int32), h)
        xi = _reflect_index(xi.astype(jnp.int32), w)
        return frames[:, yi, xi, :]  # (T,H,W,C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _augment_one(
    rng: jax.Array,
    visual: jnp.ndarray,
    audio: jnp.ndarray,
    cfg: AugmentConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment one sample: visual (T,H,W,C) [0,1], audio (F,Ta[,1]) dB.
    Same draw order as the host path so recipes transfer."""
    k = jax.random.split(rng, 10)
    squeeze = audio.ndim == 3
    if squeeze:
        audio = audio[..., 0]
    t = visual.shape[0]
    t_a = audio.shape[1]

    # 1. temporal speed warp (shared factor, both modalities)
    speed = jax.random.uniform(
        k[0], (), minval=cfg.speed_range[0], maxval=cfg.speed_range[1]
    )
    visual = jnp.take(visual, _speed_indices(t, speed), axis=0)
    audio = jnp.take(audio, _speed_indices(t_a, speed), axis=1)

    # 2. horizontal flip (p=0.5)
    do_flip = jax.random.uniform(k[1], ()) > 0.5
    visual = jnp.where(do_flip, visual[:, :, ::-1, :], visual)

    # 3. rotation (always applied; angle ~ U(-deg, +deg) like the host)
    angle = jax.random.uniform(
        k[2], (), minval=-cfg.rotation_deg, maxval=cfg.rotation_deg
    )
    visual = _rotate_frames(visual, angle)

    # 4. brightness (p=0.5)
    bright = jax.random.uniform(
        k[3], (), minval=cfg.brightness_range[0],
        maxval=cfg.brightness_range[1],
    )
    do_b = jax.random.uniform(k[4], ()) > 0.5
    visual = jnp.where(do_b, jnp.clip(visual * bright, 0.0, 1.0), visual)

    # 5. contrast (p=0.5) about the clip mean
    contrast = jax.random.uniform(
        k[5], (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    do_c = jax.random.uniform(k[6], ()) > 0.5
    mean = jnp.mean(visual)
    visual = jnp.where(
        do_c, jnp.clip((visual - mean) * contrast + mean, 0.0, 1.0), visual
    )

    # 6. Gaussian noise, visual then audio (each p=0.5)
    do_nv = jax.random.uniform(k[7], ()) > 0.5
    noise_v = jax.random.normal(k[8], visual.shape) * cfg.visual_noise_std
    visual = jnp.where(do_nv, jnp.clip(visual + noise_v, 0.0, 1.0), visual)
    do_na = jax.random.uniform(k[9], ()) > 0.5
    noise_a = (
        jax.random.normal(jax.random.fold_in(k[9], 1), audio.shape)
        * cfg.audio_noise_std
    )
    audio = jnp.where(do_na, jnp.clip(audio + noise_a, -80.0, 0.0), audio)

    if squeeze:
        audio = audio[..., None]
    return visual, audio


def augment_batch(
    rng: jax.Array,
    visual: jnp.ndarray,
    audio: jnp.ndarray,
    cfg: AugmentConfig = AugmentConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched device augmentation.

    visual: (B,T,H,W,C) float in [0,1] (uint8 accepted: normalized first).
    audio:  (B,F,Ta) or (B,F,Ta,1) log-mel dB.
    Each sample draws independent parameters (host loop parity).
    """
    if visual.dtype == jnp.uint8:
        visual = visual.astype(jnp.float32) / 255.0
    if not cfg.enabled:
        return visual, audio
    keys = jax.random.split(rng, visual.shape[0])
    return jax.vmap(_augment_one, in_axes=(0, 0, 0, None))(
        keys, visual, audio, cfg
    )

"""On-device image ops for the mouth-crop path.

The reference does crop/resize with OpenCV on host (`face_detection.py:
633-641`, `video.py:293-312`); here batched crop+resize+normalize runs as
one XLA program so frames can stream to the device as raw uint8 and the
per-window tensors never round-trip through host float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.INTER_LINEAR-convention resize (half-pixel centers, edge clamp)
    of an (..., H, W, C) array."""
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), shape, method="linear")


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_resize_normalize(
    frames: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 96,
) -> jnp.ndarray:
    """Crop per-frame boxes from uint8 frames and resize to the model crop.

    Args:
        frames: (T, H, W, 3) uint8.
        boxes: (T, 4) int32 [x1, y1, x2, y2] pixel boxes (x2/y2 exclusive).
    Returns:
        (T, out_size, out_size, 3) float32 in [0, 1].

    Uses a gather-based bilinear sample so ragged box sizes stay one static
    shape program (no per-box recompilation).
    """
    t, h, w, _ = frames.shape
    x1 = boxes[:, 0].astype(jnp.float32)
    y1 = boxes[:, 1].astype(jnp.float32)
    x2 = boxes[:, 2].astype(jnp.float32)
    y2 = boxes[:, 3].astype(jnp.float32)
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    # Half-pixel sample grid inside each box (cv2.resize convention).
    u = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size  # (S,)
    sx = x1[:, None] + u[None, :] * bw[:, None] - 0.5  # (T, S)
    sy = y1[:, None] + u[None, :] * bh[:, None] - 0.5

    # Clamp inside the box (cv2 resizes the *crop*, so it edge-replicates at
    # the crop boundary, not the frame boundary), then inside the frame.
    sx = jnp.clip(sx, x1[:, None], x2[:, None] - 1.0)
    sy = jnp.clip(sy, y1[:, None], y2[:, None] - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1i = jnp.minimum(x0 + 1, w - 1)
    y1i = jnp.minimum(y0 + 1, h - 1)
    wx = sx - x0.astype(jnp.float32)
    wy = sy - y0.astype(jnp.float32)

    f = frames.astype(jnp.float32)
    ti = jnp.arange(t)[:, None, None]

    def gather(yi, xi):
        # (T, S, S, 3) via advanced indexing on (T,H,W,3).
        return f[ti, yi[:, :, None], xi[:, None, :], :]

    top = gather(y0, x0) * (1 - wx)[:, None, :, None] + gather(y0, x1i) * wx[:, None, :, None]
    bot = gather(y1i, x0) * (1 - wx)[:, None, :, None] + gather(y1i, x1i) * wx[:, None, :, None]
    out = top * (1 - wy)[:, :, None, None] + bot * wy[:, :, None, None]
    return out / 255.0

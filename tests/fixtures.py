"""Synthetic media fixtures (the reference has none — SURVEY.md §4).

Generates small videos (moving face-like pattern) and WAV audio so pipeline
tests need no real datasets, MediaPipe, or network.
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np


def synthetic_frames(
    n: int = 45, h: int = 120, w: int = 160, face: bool = True, seed: int = 0
) -> np.ndarray:
    """(N, H, W, 3) uint8 RGB frames with a light "face" oval + dark
    oscillating "mouth" region so detector heuristics have something real."""
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 40, size=(n, h, w, 3), dtype=np.uint8)
    if not face:
        return frames
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = h // 2, w // 2
    face_mask = ((yy - cy) / (h * 0.3)) ** 2 + ((xx - cx) / (w * 0.22)) ** 2 < 1
    for i in range(n):
        frames[i][face_mask] = (205, 170, 150)
        # Eyes.
        for ex in (cx - w // 10, cx + w // 10):
            eye = ((yy - (cy - h // 8)) ** 2 + (xx - ex) ** 2) < (h * 0.03) ** 2
            frames[i][eye] = (40, 30, 30)
        # Mouth opens/closes with a 0.4 s period at 15 fps.
        openness = 0.5 + 0.5 * np.sin(2 * np.pi * i / 6.0)
        mh = max(2, int(h * 0.04 * (0.3 + openness)))
        mouth = (
            (np.abs(yy - (cy + h // 6)) < mh)
            & (np.abs(xx - cx) < w * 0.08)
        )
        frames[i][mouth] = (90, 30, 30)
    return frames


def write_video(path: Path, frames: np.ndarray, fps: float = 15.0) -> Path:
    import cv2

    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert vw.isOpened(), "cv2.VideoWriter failed to open"
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    return path


def speechish_pcm(seconds: float = 3.0, sr: int = 16000, seed: int = 0):
    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f0 = 140 + 30 * np.sin(2 * np.pi * 0.7 * t)
    y = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
        for k in range(1, 6)
    )
    envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, 1) ** 0.5
    return (y * envelope * 0.3 + rng.randn(n) * 1e-3).astype(np.float32)


def write_av_video(
    path: Path,
    frames: np.ndarray,
    fps: float = 15.0,
    pcm: np.ndarray | None = None,
    sr: int = 16000,
) -> Path:
    """Video WITH audio via the native muxer (.avi: mpeg4 + pcm_s16le)."""
    from lipsync_tpu.preprocessing.mux import write_video as mux_write

    if pcm is None:
        pcm = speechish_pcm(seconds=len(frames) / fps, sr=sr)
    return mux_write(path, frames, fps=fps, pcm=pcm, sample_rate=sr)


def write_wav(
    path: Path, seconds: float = 3.0, sr: int = 16000, kind: str = "speechish",
    seed: int = 0,
) -> Path:
    """Mono 16-bit WAV: 'speechish' = AM-modulated harmonics, 'silence',
    'tone'."""
    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    if kind == "silence":
        y = np.zeros(n)
    elif kind == "tone":
        y = 0.4 * np.sin(2 * np.pi * 440 * t)
    else:
        f0 = 140 + 30 * np.sin(2 * np.pi * 0.7 * t)
        y = sum(
            (0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
            for k in range(1, 6)
        )
        envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, 1) ** 0.5
        y = y * envelope * 0.3 + rng.randn(n) * 1e-3
    pcm = np.clip(y * 32767, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return path

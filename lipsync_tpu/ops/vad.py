"""Energy-based voice activity detection.

Port of the part of `/root/reference/app/preprocessing/audio.py:105-237`
that actually produces the mask: per-mel-frame energies with an adaptive
threshold (min of the 20th percentile and 5% of the median) and a 3-frame
any-smoothing. The reference additionally clamps the threshold with the
mean energy of a torchaudio ``F.vad``-trimmed waveform (audio.py:207-210);
torchaudio has no TPU analog here, so the clamp uses the mean energy of
above-median frames as the speech-energy estimate — a conservative stand-in
that binds in the same rare loud-speech regime.

Mask frames align with mel frames (hop 160 @ 16 kHz = 100 Hz).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def frame_energies(
    y: np.ndarray, hop_length: int = 160, frame_length: int = 400
) -> np.ndarray:
    """Mean squared amplitude per frame (audio.py:182-193)."""
    n = len(y)
    n_frames = int(np.ceil(n / hop_length))
    energies = np.empty(n_frames, np.float64)
    for i in range(n_frames):
        start = i * hop_length
        end = min(start + frame_length, n)
        seg = y[start:end]
        energies[i] = np.mean(seg.astype(np.float64) ** 2) if len(seg) else 0.0
    return energies


def detect_voice_activity_pcm(
    y: np.ndarray,
    sr: int = 16000,
    hop_length: int = 160,
    frame_length: int = 400,
) -> Tuple[np.ndarray, float]:
    """(mask, duration_sec) from mono PCM. Empty/failed -> all-True mask
    (audio.py:148-155,232-237)."""
    if y.size == 0:
        return np.ones(1, dtype=bool), 0.0
    duration_sec = len(y) / sr
    energies = frame_energies(y, hop_length, frame_length)
    if len(energies) == 0:
        return np.ones(1, dtype=bool), duration_sec

    median = np.median(energies)
    p20 = np.percentile(energies, 20)
    threshold = max(1e-8, min(p20, median * 0.05))

    speech_frames = energies[energies > median]
    if speech_frames.size:
        speech_energy = float(np.mean(speech_frames))
        threshold = min(threshold, max(1e-8, speech_energy * 0.05))

    mask = energies >= threshold
    # 3-frame "any" smoothing (audio.py:218-221).
    padded = np.concatenate([[False], mask, [False]])
    smoothed = padded[:-2] | padded[1:-1] | padded[2:]
    return smoothed, duration_sec

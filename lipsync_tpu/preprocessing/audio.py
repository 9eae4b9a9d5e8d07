"""Audio preprocessing: ingest -> device log-mel + VAD.

Mirrors `/root/reference/app/preprocessing/audio.py:47-237` with the
ffmpeg-subprocess + librosa pipeline replaced by the native in-process
decoder and the fused device mel op.

Native layout: returns ``(F, T)`` float32 dB (the reference's ``(1, F, T)``
without the channel axis; ``utils.layout`` converts).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lipsync_tpu.ops.mel import log_mel_spectrogram, pad_or_truncate_frames
from lipsync_tpu.ops.vad import detect_voice_activity_pcm
from lipsync_tpu.preprocessing import ingest
from lipsync_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _use_pallas_mel() -> bool:
    """Opt-in only. Measured on v5e-1 (BENCHMARKS.md round 2): the XLA
    rFFT+matmul mel is ~44 ms warm per 3 s clip while the Pallas kernel is
    120+ ms warm and ~350 s to compile — XLA's fusion already wins at this
    op's arithmetic intensity, so the hand kernel stays available for study
    but off the hot path (SURVEY §7.8 measure-first rule)."""
    import os

    import jax

    return (
        os.environ.get("LIPSYNC_TPU_PALLAS_MEL", "0") == "1"
        and jax.devices()[0].platform == "tpu"
    )


def preprocess_audio_pcm(
    y: np.ndarray,
    sr: int = 16000,
    n_mels: int = 80,
    hop_length: int = 160,
    win_length: int = 400,
    target_frames: Optional[int] = None,
) -> np.ndarray:
    """Mono PCM -> (n_mels, T) log-mel dB (audio.py:80-99 semantics).

    On TPU the fused Pallas kernel computes the whole chain in one pass;
    elsewhere the XLA rFFT path is used (identical outputs within 1e-4 dB).
    """
    if y.size == 0:
        raise ValueError("Empty audio signal")
    if _use_pallas_mel():
        from lipsync_tpu.ops.pallas.mel_kernel import (
            log_mel_spectrogram_pallas,
        )

        mel_fn = log_mel_spectrogram_pallas
    else:
        mel_fn = log_mel_spectrogram
    # Bucket the PCM length to the next power of two so arbitrary clip
    # durations reuse a handful of compiled programs (each fresh jit shape
    # costs minutes through the remote compile service). Zero padding is
    # numerically inert: padded frames are sliced off below, the last true
    # frames see zeros exactly as center-padding would supply, and the
    # dB max-reference only ever grows from REAL frames.
    n_true = len(y)
    n_frames_true = 1 + n_true // hop_length  # center=True frame count
    bucket = max(1 << 14, 1 << (n_true - 1).bit_length())
    if bucket != n_true:
        y = np.pad(np.asarray(y, np.float32), (0, bucket - n_true))
    mel = np.asarray(
        mel_fn(
            jnp.asarray(y),
            sr=sr,
            n_fft=win_length,
            hop_length=hop_length,
            win_length=win_length,
            n_mels=n_mels,
        )
    ).astype(np.float32)[:, :n_frames_true]
    if target_frames is not None:
        mel = pad_or_truncate_frames(mel, target_frames)
    return mel


def preprocess_audio(
    path: Path,
    sr: int = 16000,
    n_mels: int = 80,
    hop_length: int = 160,
    win_length: int = 400,
    target_frames: Optional[int] = None,
) -> np.ndarray:
    """Load (extracting from video containers transparently) and compute the
    log-mel spectrogram -> (n_mels, T) float32."""
    y = ingest.read_audio(path, sr=sr)
    if y.size == 0:
        raise ValueError(f"Empty audio signal for {path}")
    return preprocess_audio_pcm(
        y, sr=sr, n_mels=n_mels, hop_length=hop_length,
        win_length=win_length, target_frames=target_frames,
    )


def detect_voice_activity(
    path: Path, sr: int = 16000
) -> Tuple[np.ndarray, float]:
    """(per-mel-frame speech mask @100 Hz, duration seconds); failures fall
    back to an all-speech mask (audio.py:148-155,232-237)."""
    try:
        y = ingest.read_audio(path, sr=sr)
    except Exception as e:
        logger.warning("VAD audio load failed: %s — all-speech mask", e)
        return np.ones(1, dtype=bool), 0.0
    return detect_voice_activity_pcm(y, sr=sr)

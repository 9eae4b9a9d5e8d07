"""Fused on-device log-mel spectrogram.

Replaces the reference's librosa path (`/root/reference/app/preprocessing/
audio.py:80-89`: ``melspectrogram(n_fft=400, hop=160, win=400, n_mels=80,
power=2.0)`` + ``power_to_db(ref=np.max)``) with one XLA program:
frame -> Hann window -> rFFT -> |.|^2 -> mel matmul (MXU) -> dB with a
per-clip max reference. Matches librosa>=0.10 semantics (requirements.txt:13):
``center=True`` zero padding, periodic Hann, slaney-scale/slaney-norm mel
filterbank, fmin=0, fmax=sr/2, amin=1e-10, top_db=80.

The mel filterbank and window are host-precomputed constants; everything
per-clip runs on device, so batched windows cost one fused kernel launch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann (scipy ``get_window('hann', n, fftbins=True)``)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 400,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1+n_fft/2).

    Reimplements ``librosa.filters.mel`` defaults (htk=False, norm="slaney")
    from the published algorithm.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(fmin)), _hz_to_mel_slaney(np.array(fmax)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)  # (n_mels+2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_bins)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: equal-area triangles.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "win_length", "n_mels",
                     "center", "top_db"),
)
def log_mel_spectrogram(
    y: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 80,
    center: bool = True,
    top_db: Optional[float] = 80.0,
) -> jnp.ndarray:
    """Log-mel spectrogram of mono PCM ``y`` (N,) -> (n_mels, n_frames) dB.

    ``power_to_db(ref=np.max)`` semantics: dB relative to the clip's peak
    mel power, clipped at ``-top_db`` (audio.py:89).
    """
    y = y.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, (pad, pad))
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length

    # Frame via gather: (n_frames, n_fft).
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    frames = y[idx]

    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:  # librosa centers the window inside n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, :]

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (n_frames, n_bins)
    power = jnp.abs(spec) ** 2

    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))  # (n_mels, n_bins)
    # fp32 matmul: the MXU's bf16 operand rounding is audible in dB space.
    mel = jnp.dot(power, fb.T, precision=jax.lax.Precision.HIGHEST)
    mel = mel.T  # (n_mels, n_frames)

    return power_to_db(mel, top_db=top_db)


def power_to_db(
    s: jnp.ndarray, amin: float = 1e-10, top_db: Optional[float] = 80.0
) -> jnp.ndarray:
    """``librosa.power_to_db(S, ref=np.max)`` on device."""
    ref = jnp.maximum(jnp.max(s), amin)
    log_spec = 10.0 * jnp.log10(jnp.maximum(s, amin))
    log_spec = log_spec - 10.0 * jnp.log10(ref)
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def pad_or_truncate_frames(mel_db: np.ndarray, target_frames: int) -> np.ndarray:
    """Match the reference's target-frame policy (audio.py:93-99): truncate,
    or pad by repeating the LAST frame. Host-side (dynamic shapes)."""
    t = mel_db.shape[-1]
    if t < target_frames:
        pad = np.repeat(mel_db[..., -1:], target_frames - t, axis=-1)
        return np.concatenate([mel_db, pad], axis=-1)
    return mel_db[..., :target_frames]

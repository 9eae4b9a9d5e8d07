"""Pallas TPU kernel: fused log-mel spectrogram.

One kernel pass computes window -> DFT -> power -> mel projection ->
10*log10 for a block of STFT frames. The rFFT is expressed as two MXU
matmuls against Hann-windowed DFT basis matrices (N=400 real input, 201
bins), so the whole chain is 3 matmuls + a VPU square/add/log — one HBM
read of the framed PCM and one HBM write of the (T, n_mels) output,
versus the XLA path's separate gather/fft/abs/matmul/log ops.

All operand shapes are zero-padded to lane multiples host-side (K 400->512,
bins 201->256, mels 80->128); padding contributes exact zeros.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lipsync_tpu.ops.mel import hann_window, mel_filterbank

_BLOCK_T = 256
_K_PAD = 512  # n_fft 400 padded
_BINS_PAD = 256  # 201 rfft bins padded
_MELS_PAD = 128  # 80 mels padded


@functools.lru_cache(maxsize=4)
def _basis(sr: int, n_fft: int, n_mels: int):
    """Hann-folded DFT cos/sin bases and padded mel filterbank."""
    window = hann_window(n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    wc = (window[:, None] * np.cos(ang)).astype(np.float32)  # (400, 201)
    ws = (window[:, None] * np.sin(ang)).astype(np.float32)
    fb = mel_filterbank(sr, n_fft, n_mels)  # (80, 201)

    wc_p = np.zeros((_K_PAD, _BINS_PAD), np.float32)
    ws_p = np.zeros((_K_PAD, _BINS_PAD), np.float32)
    wc_p[:n_fft, : wc.shape[1]] = wc
    ws_p[:n_fft, : ws.shape[1]] = ws
    fb_p = np.zeros((_BINS_PAD, _MELS_PAD), np.float32)
    fb_p[: fb.shape[1], : n_mels] = fb.T
    return jnp.asarray(wc_p), jnp.asarray(ws_p), jnp.asarray(fb_p)


def _mel_block_kernel(frames_ref, wc_ref, ws_ref, fb_ref, out_ref):
    # HIGHEST precision: the MXU's default bf16 operand rounding costs
    # several dB at low-power bins; fp32-emulated matmuls keep the
    # spectrogram librosa-accurate (<1e-3 dB).
    hi = jax.lax.Precision.HIGHEST
    f = frames_ref[:]  # (BLOCK_T, K_PAD)
    c = jnp.dot(f, wc_ref[:], preferred_element_type=jnp.float32, precision=hi)
    s = jnp.dot(f, ws_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = c * c + s * s  # (BLOCK_T, BINS_PAD)
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[:] = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram_pallas(
    y: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 80,
    center: bool = True,
    top_db: Optional[float] = 80.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for :func:`lipsync_tpu.ops.mel.
    log_mel_spectrogram` with the compute chain in one Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert win_length == n_fft, "win_length must equal n_fft in this kernel"
    y = y.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, (pad, pad))
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length

    # Frame via gather (cheap), zero-pad K and T to tile multiples.
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    frames = y[idx]
    t_pad = -(-n_frames // _BLOCK_T) * _BLOCK_T
    frames = jnp.pad(
        frames, ((0, t_pad - n_frames), (0, _K_PAD - n_fft))
    )

    wc, ws, fb = _basis(sr, n_fft, n_mels)
    out = pl.pallas_call(
        _mel_block_kernel,
        grid=(t_pad // _BLOCK_T,),
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_T, _K_PAD), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_K_PAD, _BINS_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_PAD, _BINS_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BINS_PAD, _MELS_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK_T, _MELS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, _MELS_PAD), jnp.float32),
        interpret=interpret,
    )(frames, wc, ws, fb)

    log_spec = out[:n_frames, :n_mels].T  # (n_mels, T) in dB (abs)
    # power_to_db(ref=max) + top_db floor on the small output.
    ref = jnp.max(log_spec)
    log_spec = log_spec - ref
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, -top_db)
    return log_spec

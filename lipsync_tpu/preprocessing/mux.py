"""ctypes binding for the native muxer (write RGB frames + PCM to a file).

Used by fake-data generation (scripts/generate_audio_swap_fakes.py) and
synthetic A/V fixtures. Target ``.avi`` uses built-in mpeg4 + pcm_s16le.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_lib = None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _NATIVE_DIR / "libmux.so"
    if not so.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "libmux.so"],
            check=True, capture_output=True, timeout=120,
        )
    lib = ctypes.CDLL(str(so))
    lib.mux_write_video.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
    ]
    lib.mux_write_video.restype = ctypes.c_int
    _lib = lib
    return lib


def write_video(
    path: Path,
    frames: np.ndarray,
    fps: float = 15.0,
    pcm: Optional[np.ndarray] = None,
    sample_rate: int = 16000,
) -> Path:
    """Write (N, H, W, 3) uint8 RGB frames (+ optional mono float PCM)."""
    lib = _get_lib()
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    if pcm is not None:
        pcm = np.ascontiguousarray(pcm, np.float32)
        pcm_ptr = pcm.ctypes.data_as(ctypes.c_void_p)
        n_samples = len(pcm)
    else:
        pcm_ptr, n_samples = None, 0
    rc = lib.mux_write_video(
        str(path).encode(), frames, n, w, h, float(fps),
        pcm_ptr, n_samples, sample_rate,
    )
    if rc != 0:
        raise RuntimeError(f"mux_write_video failed ({rc}) for {path}")
    return Path(path)

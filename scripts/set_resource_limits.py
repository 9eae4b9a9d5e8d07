"""Thread/resource clamps for host preprocessing workers.

Port of `/root/reference/scripts/set_resource_limits.py:18-32` (BLAS/OMP
single-threading to avoid oversubscription when many decode workers run
alongside the device loop). Import early, before numpy/jax.

Usage:  import scripts.set_resource_limits  # or run for a shell export list
"""

from __future__ import annotations

import os

LIMITS = {
    "OMP_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
    # OpenCV's ffmpeg reader thread pool (when the cv2 fallback is used).
    "OPENCV_FFMPEG_THREADS": "1",
}


def apply() -> None:
    for key, value in LIMITS.items():
        os.environ.setdefault(key, value)


apply()

if __name__ == "__main__":
    for key, value in LIMITS.items():
        print(f"export {key}={os.environ.get(key, value)}")

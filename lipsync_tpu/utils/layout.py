"""Layout conversion between the reference's torch NCDHW conventions and
this framework's TPU channels-last conventions.

Reference layouts (predictor.py:217-222, lip_sync_model.py:94-95):
  visual ``(B, 3, T, H, W)``; audio ``(B, 1, F, T)``.
Native layouts: visual ``(B, T, H, W, 3)``; audio ``(B, F, T, 1)``.
"""

from __future__ import annotations

import numpy as np


def visual_from_torch(x):
    """(B, 3, T, H, W) -> (B, T, H, W, 3); also accepts unbatched (3, T, H, W)."""
    if x.ndim == 4:
        return np.transpose(x, (1, 2, 3, 0))
    return np.transpose(x, (0, 2, 3, 4, 1))


def visual_to_torch(x):
    if x.ndim == 4:
        return np.transpose(x, (3, 0, 1, 2))
    return np.transpose(x, (0, 4, 1, 2, 3))


def audio_from_torch(x):
    """(B, 1, F, T) -> (B, F, T, 1); also accepts unbatched (1, F, T)."""
    if x.ndim == 3:
        return np.transpose(x, (1, 2, 0))
    return np.transpose(x, (0, 2, 3, 1))


def audio_to_torch(x):
    if x.ndim == 3:
        return np.transpose(x, (2, 0, 1))
    return np.transpose(x, (0, 3, 1, 2))

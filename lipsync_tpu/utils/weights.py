"""Shipped-checkpoint discovery.

The reference ships a weights contract — a well-known on-disk location
plus a ``MODEL_PATH`` env override (`/root/reference/app/config.py:83-94`,
`weights/README.md`). This repo's committed flagship checkpoint lives at
``weights/flagship`` (the grand-union model,
`scripts/train_union_flagship.sh`); every eval script and the serving
Settings fall back to it when no explicit model path is given, so a fresh
clone scores real clips with zero setup.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
FLAGSHIP_DIR = REPO_ROOT / "weights" / "flagship"


def default_checkpoint() -> Optional[Path]:
    """The committed flagship checkpoint, or None when absent.

    ``MODEL_PATH`` (the reference's env override, config.py:83-94) wins
    over the shipped default.
    """
    if env_path := os.environ.get("MODEL_PATH"):
        p = Path(env_path)
        if p.exists():
            return p
    if FLAGSHIP_DIR.exists():
        return FLAGSHIP_DIR
    return None


def default_calibration() -> Optional[dict]:
    """Platt constants fitted alongside the flagship (flagship.json
    sidecar), or None."""
    import json

    sidecar = FLAGSHIP_DIR.with_suffix(".json")
    if not sidecar.exists():
        return None
    try:
        meta = json.loads(sidecar.read_text())
    except Exception:
        return None
    if "calibration_platt_a" in meta:
        return {
            "calibration_method": "platt",
            "calibration_platt_a": float(meta["calibration_platt_a"]),
            "calibration_platt_b": float(meta["calibration_platt_b"]),
        }
    return None

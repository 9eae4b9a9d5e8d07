"""Fit output calibrators on a labelled validation set.

Port of `/root/reference/scripts/fit_calibrator.py`: collects raw logits
over a labelled ``real/``+``fake/`` tree (or a precomputed tensor dir —
batched on TPU), fits temperature scaling (NLL via bounded scalar
minimization, :87-101), Platt scaling (Nelder-Mead, :104-120) and isotonic
regression (sklearn, pickled, :123-141), and prints the config values to
paste into Settings.

Usage:
    python scripts/fit_calibrator.py --preprocessed-dir val_tensors \
        --model-path weights/best_model_accuracy --method all
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.inference.calibration import (  # noqa: E402
    fit_isotonic,
    fit_platt,
    fit_temperature,
)
from lipsync_tpu.utils.logger import get_logger  # noqa: E402

logger = get_logger("fit_calibrator")


def collect_logits_preprocessed(args, engine=None):
    from lipsync_tpu.inference.engine import load_engine
    from lipsync_tpu.training.data import LipSyncDataset

    if engine is None:
        engine = load_engine(args.model_path)
    ds = LipSyncDataset(
        preprocessed_dir=args.preprocessed_dir,
        video_frames=engine.config.video_frames,
        audio_frames=engine.config.audio_frames,
    )
    logits, labels = [], []
    batch_v, batch_a, batch_l = [], [], []

    def flush():
        nonlocal batch_v, batch_a, batch_l
        if batch_v:
            logits.extend(
                engine.score_logits(np.stack(batch_v), np.stack(batch_a))
            )
            labels.extend(batch_l)
            batch_v, batch_a, batch_l = [], [], []

    n = len(ds) if not args.limit else min(args.limit, len(ds))
    for i in range(n):
        s = ds.get_item(i, train_mode_override=False)
        if s is None:
            continue
        batch_v.append(s[0])
        batch_a.append(s[1])
        batch_l.append(float(s[2]))
        if len(batch_v) >= args.batch_size:
            flush()
    flush()
    return np.asarray(logits), np.asarray(labels)


def main(argv=None, engine=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preprocessed-dir", type=Path, default=None)
    p.add_argument("--model-path", type=Path, default=None)
    p.add_argument("--method", choices=["temperature", "platt", "isotonic",
                                        "all"], default="all")
    p.add_argument("--isotonic-out", type=Path,
                   default=Path("isotonic_calibrator.pkl"))
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--save-logits", type=Path, default=None,
                   help="write collected (logits, labels) to this .npz")
    p.add_argument("--logits-in", type=Path, default=None,
                   help="fit from a saved .npz instead of scoring the "
                        "split (no model/TPU needed)")
    args = p.parse_args(argv)

    if args.logits_in is not None:
        saved = np.load(args.logits_in)
        logits, labels = saved["logits"], saved["labels"]
    else:
        if args.preprocessed_dir is None:
            p.error("--preprocessed-dir required unless --logits-in given")
        logits, labels = collect_logits_preprocessed(args, engine=engine)
    if args.save_logits is not None:
        np.savez(args.save_logits, logits=logits, labels=labels)
    logger.info("Collected %d logits (%.1f%% real)",
                len(logits), labels.mean() * 100 if len(labels) else 0)

    out = {}
    if args.method in ("temperature", "all"):
        t = fit_temperature(logits, labels)
        out["calibration_temperature"] = t
        print(f"calibration_method: temperature")
        print(f"calibration_temperature: {t:.4f}")
    if args.method in ("platt", "all"):
        a, b = fit_platt(logits, labels)
        out["calibration_platt_a"] = a
        out["calibration_platt_b"] = b
        print(f"calibration_platt_a: {a:.4f}")
        print(f"calibration_platt_b: {b:.4f}")
    if args.method in ("isotonic", "all"):
        probs = 1 / (1 + np.exp(-logits))
        iso = fit_isotonic(probs, labels)
        with open(args.isotonic_out, "wb") as f:
            pickle.dump(iso, f)
        out["calibration_isotonic_path"] = str(args.isotonic_out)
        print(f"calibration_isotonic_path: {args.isotonic_out}")
    return out


if __name__ == "__main__":
    main()

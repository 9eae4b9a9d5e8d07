"""Batch evaluation harness — the framework's integration test.

Port of `/root/reference/scripts/validate_pipeline.py` (791 LoC):

* ``video`` mode replays the exact production entrypoint
  (``Predictor.predict``) per file over a labelled ``real/`` + ``fake/``
  tree (:82-95,717-729).
* ``preprocessed`` mode runs batched model-only inference over an
  npy+manifest tensor dir, bypassing face detection (:382-525) — and here
  the batch runs as ONE padded TPU forward per chunk of files.
* Outputs: predictions.csv, metrics.json (accuracy/P/R/F1/FPR/FNR/ROC-AUC),
  confusion_matrix.png, roc_curve.png, high_confidence_errors.csv
  (:247-328,742-787); ``--resume``/``--save-every`` checkpointing
  (:414-437,685-703).

Usage:
    python scripts/validate_pipeline.py --data-dir data/val \
        --model-path weights/best_model_accuracy --output-dir eval_out
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.training.data import discover_video_samples  # noqa: E402
from lipsync_tpu.utils.logger import get_logger  # noqa: E402
from lipsync_tpu.utils.metrics import (  # noqa: E402
    compute_metrics_at_threshold,
    find_best_threshold,
)

logger = get_logger("validate_pipeline")


def roc_auc(fake_probs: np.ndarray, true_fake: np.ndarray) -> float:
    """Rank-based AUC (no sklearn dependency needed, but use it if present)."""
    try:
        from sklearn.metrics import roc_auc_score

        return float(roc_auc_score(true_fake, fake_probs))
    except Exception:
        order = np.argsort(fake_probs)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(fake_probs) + 1)
        pos = true_fake.astype(bool)
        n_pos, n_neg = pos.sum(), (~pos).sum()
        if n_pos == 0 or n_neg == 0:
            return 0.5
        return float(
            (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        )


def write_plots(out_dir: Path, fake_probs, true_fake, threshold: float):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    m = compute_metrics_at_threshold(fake_probs, true_fake, threshold)
    fig, ax = plt.subplots(figsize=(4, 4))
    cm = np.array([[m["tn"], m["fp"]], [m["fn"], m["tp"]]])
    ax.imshow(cm, cmap="Blues")
    for i in range(2):
        for j in range(2):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center")
    ax.set_xticks([0, 1], ["pred real", "pred fake"])
    ax.set_yticks([0, 1], ["true real", "true fake"])
    ax.set_title("Confusion matrix")
    fig.tight_layout()
    fig.savefig(out_dir / "confusion_matrix.png", dpi=120)
    plt.close(fig)

    thresholds = np.linspace(0, 1, 101)
    tpr, fpr = [], []
    pos = true_fake.astype(bool)
    for t in thresholds:
        pred = fake_probs >= t
        tp = np.sum(pred & pos)
        fp = np.sum(pred & ~pos)
        tpr.append(tp / max(1, pos.sum()))
        fpr.append(fp / max(1, (~pos).sum()))
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(fpr, tpr)
    ax.plot([0, 1], [0, 1], "--", color="gray")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title(f"ROC (AUC={roc_auc(fake_probs, true_fake):.3f})")
    fig.tight_layout()
    fig.savefig(out_dir / "roc_curve.png", dpi=120)
    plt.close(fig)


def run_video_mode(args, predictor=None) -> Dict:
    from lipsync_tpu.inference.predictor import Predictor, PredictorConfig

    if predictor is None:
        predictor = Predictor(
            model_path=args.model_path, config=PredictorConfig()
        )
    samples = discover_video_samples(args.data_dir)
    if args.limit:
        samples = samples[: args.limit]
    logger.info("Evaluating %d videos", len(samples))

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    pred_csv = out_dir / "predictions.csv"

    done: Dict[str, Dict] = {}
    if args.resume and pred_csv.exists():
        with pred_csv.open() as f:
            for row in csv.DictReader(f):
                done[row["path"]] = row
        logger.info("Resuming: %d predictions already done", len(done))

    rows: List[Dict] = list(done.values())
    new_rows: List[Dict] = []
    for i, (path, label) in enumerate(samples):
        if str(path) in done:
            continue
        t0 = time.perf_counter()
        try:
            result = predictor.predict(path)
            row = {
                "path": str(path),
                "true_label": label,  # 1 = REAL
                "verdict": result["verdict"],
                "confidence": f"{result['confidence']:.6f}",
                "is_fake": int(result["is_fake"]),
                "inference_time": f"{time.perf_counter() - t0:.3f}",
                "error": "",
            }
        except Exception as e:
            logger.warning("Failed %s: %s", path, e)
            row = {
                "path": str(path), "true_label": label, "verdict": "error",
                "confidence": "0.5", "is_fake": 0,
                "inference_time": f"{time.perf_counter() - t0:.3f}",
                "error": str(e)[:200],
            }
        rows.append(row)
        new_rows.append(row)
        if args.save_every and len(new_rows) % args.save_every == 0:
            _write_csv(pred_csv, rows)
            logger.info("Checkpoint: %d/%d", len(rows), len(samples))

    _write_csv(pred_csv, rows)
    return finalize_metrics(rows, out_dir, args.threshold)


def _write_csv(path: Path, rows: List[Dict]) -> None:
    if not rows:
        return
    with path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def finalize_metrics(rows: List[Dict], out_dir: Path, threshold: float) -> Dict:
    ok = [r for r in rows if r["verdict"] != "error"]
    if not ok:
        logger.warning("No successful predictions")
        return {}
    fake_probs = np.array([1.0 - float(r["confidence"]) for r in ok])
    true_fake = np.array([int(r["true_label"]) == 0 for r in ok])
    m = compute_metrics_at_threshold(fake_probs, true_fake, threshold)
    m["fpr"] = m["fp"] / max(1, m["fp"] + m["tn"])
    m["fnr"] = m["fn"] / max(1, m["fn"] + m["tp"])
    m["roc_auc"] = roc_auc(fake_probs, true_fake)
    best_t, best_m = find_best_threshold(fake_probs, true_fake)
    m["best_threshold"] = best_t
    m["best_threshold_f1"] = best_m["f1"]
    m["errors"] = len(rows) - len(ok)
    (out_dir / "metrics.json").write_text(json.dumps(m, indent=2))
    write_plots(out_dir, fake_probs, true_fake, threshold)

    # High-confidence errors (validate_pipeline.py:303-328).
    hc = []
    for r, fp_prob, tf in zip(ok, fake_probs, true_fake):
        pred_fake = fp_prob >= threshold
        if pred_fake != tf and abs(fp_prob - 0.5) > 0.3:
            hc.append(r)
    if hc:
        _write_csv(out_dir / "high_confidence_errors.csv", hc)
    logger.info(
        "Metrics: acc=%.4f P=%.4f R=%.4f F1=%.4f AUC=%.4f (errors=%d)",
        m["accuracy"], m["precision"], m["recall"], m["f1"], m["roc_auc"],
        m["errors"],
    )
    return m


def run_preprocessed_mode(args, engine=None) -> Dict:
    """Batched model-only inference (validate_pipeline.py:382-525) — all
    windows in each file-chunk scored as one padded TPU batch."""
    from lipsync_tpu.inference.engine import load_engine
    from lipsync_tpu.training.data import LipSyncDataset

    if engine is None:
        engine = load_engine(
            args.model_path,
            quantized_int8=getattr(args, "quantized_int8", False),
        )
        if getattr(args, "calibration_method", "none") != "none":
            # Evaluate through the production calibrator (the reference's
            # Settings thread calibration into the Predictor; preprocessed
            # eval honors the same knobs, fit via fit_calibrator.py).
            from lipsync_tpu.inference.calibration import Calibrator

            engine.calibrator = Calibrator.from_config(
                method=args.calibration_method,
                temperature=args.calibration_temperature,
                platt_a=args.calibration_platt_a,
                platt_b=args.calibration_platt_b,
                isotonic_path=args.calibration_isotonic_path,
            )
    ds = LipSyncDataset(
        preprocessed_dir=args.preprocessed_dir,
        video_frames=engine.config.video_frames,
        audio_frames=engine.config.audio_frames,
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    batch_v, batch_a, batch_meta = [], [], []

    def flush():
        nonlocal batch_v, batch_a, batch_meta
        if not batch_v:
            return
        probs = engine.score_probs(
            np.stack(batch_v), np.stack(batch_a)
        )
        for (path, label), p in zip(batch_meta, probs):
            rows.append({
                "path": str(path), "true_label": label,
                "verdict": "real" if p >= args.threshold else "fake",
                "confidence": f"{float(p):.6f}",
                "is_fake": int(p < args.threshold),
                "inference_time": "0", "error": "",
            })
        batch_v, batch_a, batch_meta = [], [], []

    n = len(ds) if not args.limit else min(args.limit, len(ds))
    for i in range(n):
        sample = ds.get_item(i, train_mode_override=False)
        if sample is None:
            continue
        v, a, label = sample
        batch_v.append(v)
        batch_a.append(a)
        batch_meta.append((ds.samples[i][0], int(label)))
        if len(batch_v) >= args.batch_size:
            flush()
    flush()
    _write_csv(out_dir / "predictions.csv", rows)
    return finalize_metrics(rows, out_dir, args.threshold)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batch evaluation harness")
    p.add_argument("--data-dir", type=Path, default=None,
                   help="Labelled real/+fake/ video tree (video mode)")
    p.add_argument("--preprocessed-dir", type=Path, default=None,
                   help="Precomputed tensor dir (preprocessed mode)")
    p.add_argument("--model-path", type=Path, required=False)
    p.add_argument("--output-dir", type=Path, default=Path("eval_out"))
    p.add_argument("--threshold", type=float, default=0.5,
                   help="P(FAKE) decision threshold")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save-every", type=int, default=25)
    # Calibration knobs (same names/defaults as the serving Settings).
    p.add_argument("--quantized-int8", action="store_true",
                   help="Serve through the int8 MXU conv lowering "
                        "(Settings.quantized_int8; layers.Int8Conv)")
    p.add_argument("--calibration-method", default="none",
                   choices=["none", "temperature", "platt", "isotonic"])
    p.add_argument("--calibration-temperature", type=float, default=1.0)
    p.add_argument("--calibration-platt-a", type=float, default=1.0)
    p.add_argument("--calibration-platt-b", type=float, default=0.0)
    p.add_argument("--calibration-isotonic-path", type=str, default=None)
    return p


def main() -> None:
    args = build_argparser().parse_args()
    if args.preprocessed_dir is not None:
        run_preprocessed_mode(args)
    elif args.data_dir is not None:
        run_video_mode(args)
    else:
        raise SystemExit("Provide --data-dir or --preprocessed-dir")


if __name__ == "__main__":
    main()

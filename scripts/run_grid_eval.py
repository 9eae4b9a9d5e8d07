"""GRID-corpus evaluation.

Port of `/root/reference/scripts/run_grid_eval.py:57-236`: evaluate on
directories of GRID ``.mpg`` clips (all REAL) or on a labels CSV
(``path,label`` with 1 = REAL), via the single-window production scorer
(``predict_from_path``); prints accuracy/P/R/F1 and the best-F1 threshold
sweep.

Usage:
    python scripts/run_grid_eval.py --videos-dir grid/s1 --model-path W
    python scripts/run_grid_eval.py --labels-csv labels.csv --model-path W
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.utils.logger import get_logger  # noqa: E402
from lipsync_tpu.utils.metrics import (  # noqa: E402
    compute_metrics_at_threshold,
    find_best_threshold,
)

logger = get_logger("run_grid_eval")

GRID_EXTENSIONS = (".mpg", ".mpeg", ".mp4", ".avi", ".mov")


def collect_samples(args):
    samples = []
    if args.labels_csv:
        with open(args.labels_csv) as f:
            for row in csv.DictReader(f):
                samples.append((Path(row["path"]), int(row["label"])))
    else:
        for p in sorted(Path(args.videos_dir).rglob("*")):
            if p.suffix.lower() in GRID_EXTENSIONS:
                samples.append((p, 1))  # GRID clips are all real
    if args.limit:
        samples = samples[: args.limit]
    return samples


def main(argv=None, predictor=None):
    p = argparse.ArgumentParser()
    p.add_argument("--videos-dir", type=Path, default=None)
    p.add_argument("--labels-csv", type=Path, default=None)
    p.add_argument("--model-path", type=Path, default=None)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    if predictor is None:
        from lipsync_tpu.inference.predictor import Predictor

        predictor = Predictor(model_path=args.model_path)

    samples = collect_samples(args)
    logger.info("Evaluating %d clips", len(samples))
    fake_probs, true_fake = [], []
    for path, label in samples:
        try:
            result = predictor.predict_from_path(path)
        except Exception as e:
            logger.warning("Failed %s: %s", path, e)
            continue
        fake_probs.append(result["manipulation_probability"])
        true_fake.append(label == 0)

    fake_probs = np.asarray(fake_probs)
    true_fake = np.asarray(true_fake)
    m = compute_metrics_at_threshold(fake_probs, true_fake, args.threshold)
    print(
        f"accuracy={m['accuracy']:.4f} precision={m['precision']:.4f} "
        f"recall={m['recall']:.4f} f1={m['f1']:.4f} "
        f"(tp={m['tp']} tn={m['tn']} fp={m['fp']} fn={m['fn']})"
    )
    if true_fake.any() and (~true_fake).any():
        best_t, best_m = find_best_threshold(fake_probs, true_fake)
        print(f"best_f1={best_m['f1']:.4f} at threshold={best_t:.2f}")
    return m


if __name__ == "__main__":
    main()

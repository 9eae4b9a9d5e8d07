"""Threshold sweep over an existing predictions.csv.

Port of `/root/reference/scripts/checking_threshold.py` (confusion at
candidate thresholds from saved eval output).

Usage:  python scripts/checking_threshold.py eval_out/predictions.csv
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.utils.metrics import compute_metrics_at_threshold  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pred_csv = Path(argv[0]) if argv else Path("eval_out/predictions.csv")
    rows = [r for r in csv.DictReader(pred_csv.open())
            if r.get("verdict") != "error"]
    fake_probs = np.array([1.0 - float(r["confidence"]) for r in rows])
    true_fake = np.array([int(r["true_label"]) == 0 for r in rows])
    results = []
    for t in np.arange(0.05, 1.0, 0.05):
        m = compute_metrics_at_threshold(fake_probs, true_fake, float(t))
        results.append(m)
        print(
            f"t={t:.2f} acc={m['accuracy']:.4f} P={m['precision']:.4f} "
            f"R={m['recall']:.4f} F1={m['f1']:.4f} "
            f"(tp={m['tp']} fp={m['fp']} tn={m['tn']} fn={m['fn']})"
        )
    return results


if __name__ == "__main__":
    main()

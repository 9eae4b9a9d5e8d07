"""Map high-confidence eval errors back to their source clips.

Port of `/root/reference/scripts/get_fp_from_zarr.py` for the npy/manifest
storage: join predictions.csv with the precompute manifest and list the
source videos behind false positives/negatives for manual review.

Usage:
    python scripts/get_false_positives.py --predictions eval_out/predictions.csv \
        [--manifest pre/manifest.jsonl] [--kind fp|fn|all]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--predictions", type=Path, required=True)
    p.add_argument("--manifest", type=Path, default=None)
    p.add_argument("--kind", choices=["fp", "fn", "all"], default="fp")
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args(argv)

    source_by_key = {}
    if args.manifest and args.manifest.exists():
        for line in args.manifest.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                source_by_key[rec.get("key", "")] = rec.get("source_path", "")

    rows = [r for r in csv.DictReader(args.predictions.open())
            if r.get("verdict") != "error"]
    out = []
    for r in rows:
        fake_prob = 1.0 - float(r["confidence"])
        pred_fake = fake_prob >= args.threshold
        true_fake = int(r["true_label"]) == 0
        is_fp = pred_fake and not true_fake  # real clip flagged fake
        is_fn = (not pred_fake) and true_fake  # fake clip passed as real
        if (args.kind == "fp" and not is_fp) or (
            args.kind == "fn" and not is_fn
        ) or (args.kind == "all" and not (is_fp or is_fn)):
            continue
        path = r["path"]
        key = Path(path).stem.replace("_visual", "").replace("_v", "")
        source = source_by_key.get(key, path)
        kind = "FP" if is_fp else "FN"
        out.append((kind, fake_prob, source))
        print(f"{kind} fake_prob={fake_prob:.3f} {source}")
    print(f"\n{len(out)} {args.kind.upper()} clips "
          f"(of {len(rows)} predictions)")
    return out


if __name__ == "__main__":
    main()

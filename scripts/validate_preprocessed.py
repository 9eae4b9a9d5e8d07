"""Sanity-check a precomputed tensor directory.

Port of `/root/reference/scripts/validate_preprocessed.py`: verify every
manifest record loads, windows sample correctly, and report label balance.

Usage:  python scripts/validate_preprocessed.py --preprocessed-dir pre
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.training.data import LipSyncDataset  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preprocessed-dir", type=Path, required=True)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    ds = LipSyncDataset(preprocessed_dir=args.preprocessed_dir)
    n = min(args.limit, len(ds)) if args.limit else len(ds)
    ok, failed, labels = 0, [], {0: 0, 1: 0}
    for i in range(n):
        s = ds.get_item(i, train_mode_override=False)
        if s is None:
            failed.append(i)
        else:
            ok += 1
            labels[int(s[2])] += 1
    print(f"{ok}/{n} samples load (labels: {labels[1]} real / "
          f"{labels[0]} fake)")
    if failed:
        print(f"FAILED indices: {failed[:20]}{'...' if len(failed) > 20 else ''}")
    return len(failed)


if __name__ == "__main__":
    raise SystemExit(main())

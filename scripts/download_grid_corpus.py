"""Download the GRID audiovisual corpus for evaluation.

Port of `/root/reference/scripts/download_grid_corpus.py` (Zenodo GRID
archive fetch + extraction). Network-gated: in zero-egress environments it
prints the manual instructions and exits.

Usage:  python scripts/download_grid_corpus.py --output-dir data/grid \
            --speakers s1 s2
"""

from __future__ import annotations

import argparse
import sys
import urllib.error
import urllib.request
import zipfile
from pathlib import Path

GRID_BASE_URL = "https://zenodo.org/records/3625687/files"


def download_speaker(speaker: str, out_dir: Path, timeout: int = 60) -> bool:
    url = f"{GRID_BASE_URL}/{speaker}.zip"
    dest = out_dir / f"{speaker}.zip"
    if dest.exists():
        print(f"{speaker}: already downloaded")
        return True
    try:
        print(f"{speaker}: fetching {url}")
        urllib.request.urlretrieve(url, dest)
    except (urllib.error.URLError, OSError) as e:
        print(f"{speaker}: download failed ({e}).")
        return False
    with zipfile.ZipFile(dest) as z:
        z.extractall(out_dir / speaker)
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", type=Path, default=Path("data/grid"))
    p.add_argument("--speakers", nargs="+", default=["s1"])
    args = p.parse_args(argv)
    args.output_dir.mkdir(parents=True, exist_ok=True)

    ok = 0
    for s in args.speakers:
        if download_speaker(s, args.output_dir):
            ok += 1
    if ok == 0:
        print(
            "\nNo downloads succeeded (offline environment?). Manual steps:\n"
            f"  1. Fetch {GRID_BASE_URL}/<speaker>.zip (e.g. s1.zip)\n"
            f"  2. Extract under {args.output_dir}/<speaker>/\n"
            "  3. Evaluate with scripts/run_grid_eval.py --videos-dir ..."
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

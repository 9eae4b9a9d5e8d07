"""Download AVSpeech clips listed in the official CSV.

Port of `/root/reference/scripts/download_avspeech_clips.py` (yt-dlp clip
fetch with multi-strategy fallback). Network- and yt-dlp-gated: without
either it prints manual instructions.

CSV columns: youtube_id, start_sec, end_sec, x, y
Usage:
    python scripts/download_avspeech_clips.py --csv avspeech_train.csv \
        --output-dir data/avspeech --limit 100
"""

from __future__ import annotations

import argparse
import csv
import shutil
import subprocess
from pathlib import Path


def have_ytdlp() -> bool:
    return shutil.which("yt-dlp") is not None


def download_clip(row, out_dir: Path, timeout: int = 120) -> bool:
    yt_id, start, end = row[0], float(row[1]), float(row[2])
    dest = out_dir / f"{yt_id}_{start:.1f}.mp4"
    if dest.exists():
        return True
    # Strategy ladder: best mp4 -> any best (yt-dlp transcodes).
    for fmt in ("bv*[ext=mp4]+ba[ext=m4a]/b[ext=mp4]", "b"):
        cmd = [
            "yt-dlp", "-f", fmt,
            "--download-sections", f"*{start}-{end}",
            "-o", str(dest),
            f"https://www.youtube.com/watch?v={yt_id}",
        ]
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=timeout)
            if r.returncode == 0 and dest.exists():
                return True
        except (subprocess.TimeoutExpired, OSError):
            pass
    return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, default=Path("data/avspeech"))
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    if not have_ytdlp():
        print(
            "yt-dlp is not installed/offline environment. Manual steps:\n"
            "  1. pip install yt-dlp (on a networked machine)\n"
            f"  2. Re-run this script; clips land in {args.output_dir}\n"
            "  3. Then scripts/filter_corrupt_videos.py + precompute."
        )
        return 1

    args.output_dir.mkdir(parents=True, exist_ok=True)
    rows = list(csv.reader(args.csv.open()))
    if args.limit:
        rows = rows[: args.limit]
    ok = sum(download_clip(r, args.output_dir) for r in rows)
    print(f"Downloaded {ok}/{len(rows)} clips")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Explain why videos fail to load.

Port of `/root/reference/scripts/diagnose_videos.py`: probe container
metadata and attempt decode, reporting per-file diagnosis.

Usage:  python scripts/diagnose_videos.py --data-dir data/bad_clips
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.preprocessing import ingest  # noqa: E402

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".mpg", ".mpeg", ".mkv", ".webm")


def diagnose(path: Path) -> dict:
    report = {"path": str(path)}
    info = ingest.probe(path)
    report["probe"] = {
        "width": info.width, "height": info.height, "fps": info.fps,
        "duration_sec": info.duration_sec, "nb_frames": info.nb_frames,
        "has_audio": info.has_audio, "sample_rate": info.sample_rate,
    }
    try:
        frames = ingest.read_video(path, 15.0, max_total_frames=16)
        report["decode"] = f"ok ({len(frames)} frames {frames.shape[1:]})"
    except Exception as e:
        report["decode"] = f"FAILED: {e}"
    try:
        pcm = ingest.read_audio(path, 16000)
        report["audio"] = f"ok ({len(pcm)} samples)" if len(pcm) else "no audio stream"
    except Exception as e:
        report["audio"] = f"FAILED: {e}"
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", type=Path, required=True)
    args = p.parse_args(argv)
    reports = []
    for path in sorted(args.data_dir.rglob("*")):
        if path.suffix.lower() in VIDEO_EXTENSIONS:
            r = diagnose(path)
            reports.append(r)
            print(f"{r['path']}")
            print(f"  probe : {r['probe']}")
            print(f"  decode: {r['decode']}")
            print(f"  audio : {r['audio']}")
    return reports


if __name__ == "__main__":
    main()

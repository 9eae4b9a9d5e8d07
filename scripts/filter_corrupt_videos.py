"""Dataset hygiene: quarantine videos the training pipeline cannot use.

Port of `/root/reference/scripts/filter_corrupt_videos.py:42-140`: per
video, test decode, audio extraction, and face detection the same way the
pipeline does; move failures to ``corruptedclips/`` preserving the
directory structure.

Usage:
    python scripts/filter_corrupt_videos.py --data-dir data/train
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.preprocessing import ingest  # noqa: E402
from lipsync_tpu.preprocessing.video import detect_and_crop_tracks  # noqa: E402
from lipsync_tpu.utils.logger import get_logger  # noqa: E402

logger = get_logger("filter_corrupt_videos")

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".mpg", ".mpeg")


def test_video(path: Path, check_faces: bool, min_frames: int = 8) -> str:
    """Return '' if usable, else the failure reason."""
    info = ingest.probe(path)
    if info.nb_frames == 0 and info.duration_sec == 0:
        return "unreadable container"
    try:
        frames = ingest.read_video(path, target_fps=15.0, max_total_frames=64)
    except Exception as e:
        return f"decode failed: {e}"
    if len(frames) < min_frames:
        return f"too few frames ({len(frames)})"
    try:
        pcm = ingest.read_audio(path, sr=16000)
    except Exception as e:
        return f"audio decode failed: {e}"
    if len(pcm) == 0:
        return "no audio stream"
    if check_faces:
        tracks = detect_and_crop_tracks(frames[:32], max_tracks=1)
        if not tracks or tracks[0].hits == 0:
            return "no face detected"
    return ""


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", type=Path, required=True)
    p.add_argument("--quarantine-dir", type=Path, default=None)
    p.add_argument("--no-face-check", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    quarantine = args.quarantine_dir or (args.data_dir.parent / "corruptedclips")
    videos = sorted(
        p for p in args.data_dir.rglob("*")
        if p.suffix.lower() in VIDEO_EXTENSIONS
    )
    logger.info("Checking %d videos", len(videos))
    moved = 0
    for path in videos:
        reason = test_video(path, check_faces=not args.no_face_check)
        if not reason:
            continue
        rel = path.relative_to(args.data_dir)
        dest = quarantine / rel
        logger.info("CORRUPT %s: %s", rel, reason)
        if not args.dry_run:
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(path), str(dest))
        moved += 1
    logger.info("Quarantined %d/%d videos -> %s", moved, len(videos),
                quarantine)
    return moved


if __name__ == "__main__":
    main()

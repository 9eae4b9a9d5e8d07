"""Re-encode videos into a pipeline-friendly format.

Port of `/root/reference/scripts/convert_videos.py:30-44` (ffmpeg re-encode
to a constant-frame-rate, widely-decodable codec): decode through the
native ingest (any codec ffmpeg reads) and re-encode with the native muxer
(mpeg4/pcm .avi) at a constant target fps, preserving audio.

Usage:  python scripts/convert_videos.py --input-dir raw/ --output-dir cfr/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.preprocessing import ingest  # noqa: E402
from lipsync_tpu.preprocessing.mux import write_video  # noqa: E402
from lipsync_tpu.utils.logger import get_logger  # noqa: E402

logger = get_logger("convert_videos")

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".mpg", ".mpeg", ".mkv", ".webm")


def convert(path: Path, out_path: Path, fps: float, sr: int) -> None:
    frames = ingest.read_video(path, target_fps=fps)
    pcm = ingest.read_audio(path, sr=sr)
    write_video(
        out_path, frames, fps=fps,
        pcm=pcm if len(pcm) else None, sample_rate=sr,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--sample-rate", type=int, default=16000)
    args = p.parse_args(argv)

    args.output_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for path in sorted(args.input_dir.rglob("*")):
        if path.suffix.lower() not in VIDEO_EXTENSIONS:
            continue
        rel = path.relative_to(args.input_dir).with_suffix(".avi")
        out = args.output_dir / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        try:
            convert(path, out, args.fps, args.sample_rate)
            n += 1
        except Exception as e:
            logger.warning("Convert failed %s: %s", path, e)
    logger.info("Converted %d videos", n)
    return n


if __name__ == "__main__":
    main()

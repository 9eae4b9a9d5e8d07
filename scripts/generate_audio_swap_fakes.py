"""Synthesize FAKE training clips by swapping audio between real videos.

Port of `/root/reference/scripts/generate_audio_swap_fakes.py:48-92`
(ffmpeg-subprocess remux of video A + audio B) using the framework's
in-process native decoder + muxer: decode A's frames and B's PCM, write an
``.avi`` (mpeg4 + pcm_s16le). Output is labelled FAKE by directory.

Usage:
    python scripts/generate_audio_swap_fakes.py \
        --real-dir data/real --output-dir data/1_fake --limit 100
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.preprocessing import ingest  # noqa: E402
from lipsync_tpu.preprocessing.mux import write_video  # noqa: E402
from lipsync_tpu.utils.logger import get_logger  # noqa: E402

logger = get_logger("generate_audio_swap_fakes")

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".mpg", ".mpeg")


def audio_swap(video_a: Path, video_b: Path, out_path: Path,
               target_fps: float = 15.0, sr: int = 16000) -> None:
    """video from A + audio from B -> out (a lip-sync mismatch fake)."""
    frames = ingest.read_video(video_a, target_fps=target_fps)
    pcm = ingest.read_audio(video_b, sr=sr)
    if len(pcm) == 0:
        raise ValueError(f"No audio stream in {video_b}")
    # Trim/pad audio to the video duration.
    want = int(len(frames) / target_fps * sr)
    if len(pcm) >= want:
        pcm = pcm[:want]
    else:
        pcm = np.pad(pcm, (0, want - len(pcm)))
    write_video(out_path, frames, fps=target_fps, pcm=pcm, sample_rate=sr)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--real-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target-fps", type=float, default=15.0)
    args = p.parse_args(argv)

    videos = sorted(
        p for p in args.real_dir.rglob("*")
        if p.suffix.lower() in VIDEO_EXTENSIONS
    )
    if len(videos) < 2:
        raise SystemExit("Need at least 2 source videos for audio swapping")
    args.output_dir.mkdir(parents=True, exist_ok=True)

    rng = np.random.RandomState(args.seed)
    n = args.limit or len(videos)
    made = 0
    for i in range(n):
        a = videos[i % len(videos)]
        # Pick a different clip's audio.
        while True:
            b = videos[rng.randint(len(videos))]
            if b != a:
                break
        out = args.output_dir / f"{a.stem}__audio_{b.stem}.avi"
        try:
            audio_swap(a, b, out, target_fps=args.target_fps)
            made += 1
        except Exception as e:
            logger.warning("Swap failed (%s + %s): %s", a.name, b.name, e)
    logger.info("Generated %d audio-swap fakes in %s", made, args.output_dir)
    return made


if __name__ == "__main__":
    main()

"""Offline preprocessing of raw videos into training tensors.

Port of `/root/reference/scripts/precompute_training_tensors.py`:
two modes (``fixed_clip`` = model-ready windows, ``full_sequence`` = full
uint8 crop sequence + full mel for random-window sampling at train time),
npy storage + ``manifest.jsonl``, and source-path-based incremental resume
(:359-391). Native layouts; decoding/detection run through the framework's
ingest + tracker stack.

Usage:
    python scripts/precompute_training_tensors.py \
        --data-dir data/AVLips --output-dir precomputed --mode full_sequence
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.preprocessing import ingest  # noqa: E402
from lipsync_tpu.preprocessing.audio import preprocess_audio  # noqa: E402
from lipsync_tpu.preprocessing.video import (  # noqa: E402
    detect_and_crop_tracks,
    preprocess_video,
)
from lipsync_tpu.training.data import discover_video_samples  # noqa: E402
from lipsync_tpu.utils.logger import get_logger  # noqa: E402

logger = get_logger("precompute")


def precompute_one(
    path: Path,
    label: int,
    out_dir: Path,
    index: int,
    mode: str,
    video_frames: int,
    audio_frames: int,
    target_fps: float,
    backend=None,
    use_face_detection: bool = True,
) -> dict:
    key = f"sample_{index:06d}"
    if mode == "fixed_clip":
        visual = preprocess_video(
            path, max_frames=video_frames, backend=backend,
            use_face_detection=use_face_detection,
        )  # (T, 96, 96, 3) float32
        audio = preprocess_audio(path, target_frames=audio_frames)  # (80, T)
    else:  # full_sequence
        frames = ingest.read_video(path, target_fps=target_fps)
        if use_face_detection:
            tracks = detect_and_crop_tracks(
                frames, backend=backend, max_tracks=1
            )
            if not tracks:
                raise ValueError("no face track")
            visual = (tracks[0].crops * 255.0).astype(np.uint8)
        else:
            from lipsync_tpu.preprocessing.face_detection import (
                center_crop_box,
            )
            from lipsync_tpu.preprocessing.video import crop_track_on_device

            h, w = frames.shape[1:3]
            box = center_crop_box(h, w, 96)
            crops = crop_track_on_device(frames, [box] * len(frames), 0, 96)
            visual = (crops * 255.0).astype(np.uint8)
        audio = preprocess_audio(path)  # full (80, T)

    visual_rel = f"{key}_visual.npy"
    audio_rel = f"{key}_audio.npy"
    np.save(out_dir / visual_rel, visual)
    np.save(out_dir / audio_rel, audio)
    return {
        "key": key,
        "source_path": str(path),
        "label": int(label),
        "visual_relpath": visual_rel,
        "audio_relpath": audio_rel,
        "precompute_mode": mode,
        "target_fps": target_fps,
        "mel_hz": 100.0,
        "visual_shape": list(visual.shape),
        "audio_shape": list(audio.shape),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--mode", choices=["fixed_clip", "full_sequence"],
                   default="full_sequence")
    p.add_argument("--video-frames", type=int, default=32)
    p.add_argument("--audio-frames", type=int, default=128)
    p.add_argument("--target-fps", type=float, default=15.0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--no-face-detection", action="store_true")
    args = p.parse_args()

    out = args.output_dir
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.jsonl"

    done_sources = set()
    records = []
    if manifest_path.exists():  # incremental resume by source path
        for line in manifest_path.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                records.append(rec)
                done_sources.add(rec["source_path"])
        logger.info("Resuming: %d samples already precomputed", len(records))

    samples = discover_video_samples(args.data_dir)
    if args.limit:
        samples = samples[: args.limit]
    logger.info("Discovered %d samples", len(samples))

    n_done, n_failed = 0, 0
    with manifest_path.open("a") as mf:
        for path, label in samples:
            if str(path) in done_sources:
                continue
            try:
                rec = precompute_one(
                    path, label, out, len(records), args.mode,
                    args.video_frames, args.audio_frames, args.target_fps,
                    use_face_detection=not args.no_face_detection,
                )
            except Exception as e:
                logger.warning("Failed %s: %s", path, e)
                n_failed += 1
                continue
            records.append(rec)
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
            n_done += 1
            if n_done % 25 == 0:
                logger.info("Precomputed %d samples (%d failed)",
                            n_done, n_failed)
    logger.info("Done: %d new samples, %d failed, %d total",
                n_done, n_failed, len(records))


if __name__ == "__main__":
    main()

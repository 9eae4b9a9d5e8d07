"""Audio-energy vs mouth-motion diagnostic plots.

Port of `/root/reference/scripts/debug_clips.py`: for each clip, plot the
per-frame mouth-motion energy against the audio energy envelope plus the
speaking-alignment correlation — the signals behind the mouth-motion guard.

Usage:  python scripts/debug_clips.py --video clip.mp4 --out debug.png
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.inference import policy  # noqa: E402
from lipsync_tpu.preprocessing.audio import preprocess_audio  # noqa: E402
from lipsync_tpu.preprocessing.video import preprocess_video  # noqa: E402


def analyze(video: Path, backend=None) -> dict:
    visual = preprocess_video(video, backend=backend)  # (32, 96, 96, 3)
    audio = preprocess_audio(video, target_frames=128)  # (80, 128)
    frames = visual.mean(axis=-1)
    motion = np.abs(np.diff(frames, axis=0)).mean(axis=(1, 2))
    audio_energy = audio.mean(axis=0)
    return {
        "motion": motion,
        "audio_energy": audio_energy,
        "alignment_score": policy.speaking_alignment_score(visual, audio),
        "mouth_check": policy.mouth_motion_energy_check(visual, audio),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video", type=Path, required=True)
    p.add_argument("--out", type=Path, default=Path("debug_clip.png"))
    args = p.parse_args(argv)

    r = analyze(args.video)
    print(f"alignment_score: {r['alignment_score']:.3f}")
    print(f"mouth_check:     {r['mouth_check']}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 5), sharex=False)
        ax1.plot(r["motion"])
        ax1.set_title("Mouth motion energy (per frame)")
        ax2.plot(r["audio_energy"])
        ax2.set_title("Audio energy (mel dB, per frame)")
        fig.suptitle(
            f"{args.video.name}: alignment={r['alignment_score']:.3f}, "
            f"check={r['mouth_check']['check_result']}"
        )
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"Plot saved to {args.out}")
    except Exception as e:
        print(f"(plotting skipped: {e})")
    return r


if __name__ == "__main__":
    main()

"""Generate a synthetic lip-sync dataset for end-to-end pipeline checks.

REAL clips: the mouth opening tracks the audio amplitude envelope frame by
frame (in sync). FAKE clips: the mouth follows an independent envelope
(the audio-swap manipulation the detector exists to catch). Output is a
``0_real/`` + ``1_fake/`` tree of .avi files (native muxer) that the whole
stack — discovery, precompute, training, eval — consumes like real data.

Usage:
    python scripts/make_synthetic_dataset.py --output-dir data/synth \
        --n-per-class 40 --seconds 3
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.preprocessing.mux import write_video  # noqa: E402


def speech_envelope(seconds: float, sr: int, rng) -> np.ndarray:
    """Random syllable-rate (2-5 Hz) amplitude envelope in [0, 1]."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = np.zeros(n)
    for _ in range(3):
        f = rng.uniform(1.5, 5.0)
        phase = rng.uniform(0, 2 * np.pi)
        env += np.clip(np.sin(2 * np.pi * f * t + phase), 0, 1)
    env = env / max(env.max(), 1e-6)
    return env


def render_clip(
    envelope_video: np.ndarray,
    envelope_audio: np.ndarray,
    seconds: float,
    fps: float,
    sr: int,
    rng,
    h: int = 140,
    w: int = 180,
    jitter: bool = False,
) -> tuple:
    """Frames whose mouth opening follows envelope_video; PCM voiced by
    envelope_audio.

    ``jitter=True`` randomizes face position/scale/skin/lip color per clip
    so the classifier must use audio-visual SYNC, not pixel idiosyncrasies
    (round-2 hardening; see BENCHMARKS.md synthetic eval).
    """
    n_frames = int(seconds * fps)
    n_samples = int(seconds * sr)
    t = np.arange(n_samples) / sr
    f0 = 150 + 40 * np.sin(2 * np.pi * 0.6 * t + rng.uniform(0, 6))
    carrier = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
        for k in range(1, 5)
    )
    pcm = (carrier * envelope_audio * 0.4).astype(np.float32)
    pcm += rng.randn(n_samples).astype(np.float32) * 5e-4

    yy, xx = np.mgrid[0:h, 0:w]
    if jitter:
        cy = h // 2 + int(rng.uniform(-0.10, 0.10) * h)
        cx = w // 2 + int(rng.uniform(-0.12, 0.12) * w)
        scale = rng.uniform(0.75, 1.2)
        skin = tuple(
            int(c) for c in np.asarray((200, 168, 150)) * rng.uniform(0.6, 1.1)
        )
        lip = tuple(
            int(c) for c in np.asarray((80, 25, 25)) * rng.uniform(0.7, 1.3)
        )
        noise_hi = rng.randint(15, 45)
    else:
        cy, cx, scale, skin, lip, noise_hi = (
            h // 2, w // 2, 1.0, (200, 168, 150), (80, 25, 25), 30
        )
    face = (
        ((yy - cy) / (h * 0.32 * scale)) ** 2
        + ((xx - cx) / (w * 0.24 * scale)) ** 2
    ) < 1
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    base = rng.randint(0, noise_hi, size=(h, w, 3)).astype(np.uint8)
    env_at_frame = envelope_video[
        np.minimum((np.arange(n_frames) * sr / fps).astype(int), n_samples - 1)
    ]
    eye_dx = int(w * scale) // 9
    for i in range(n_frames):
        img = base.copy()
        img[face] = skin
        for ex in (cx - eye_dx, cx + eye_dx):
            eye = (
                (yy - (cy - int(h * scale) // 7)) ** 2 + (xx - ex) ** 2
            ) < (h * 0.035 * scale) ** 2
            img[eye] = (40, 30, 30)
        openness = env_at_frame[i]
        mh = max(1, int(h * scale * (0.012 + 0.06 * openness)))
        mouth = (
            (np.abs(yy - (cy + int(h * scale) // 5)) < mh)
            & (np.abs(xx - cx) < w * 0.10 * scale)
        )
        img[mouth] = lip
        frames[i] = img
    return frames, pcm


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--n-per-class", type=int, default=40)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--fps", type=float, default=15.0)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jitter", action="store_true",
                   help="Randomize face position/scale/colors per clip")
    p.add_argument("--hard-negatives", action="store_true",
                   help="Half the fakes use the SAME envelope time-shifted "
                        "0.25-0.8 s (misaligned lip-sync, the canonical "
                        "manipulation) instead of an independent envelope")
    args = p.parse_args(argv)

    real_dir = args.output_dir / "0_real"
    fake_dir = args.output_dir / "1_fake"
    real_dir.mkdir(parents=True, exist_ok=True)
    fake_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    for i in range(args.n_per_class):
        env = speech_envelope(args.seconds, args.sr, rng)
        frames, pcm = render_clip(
            env, env, args.seconds, args.fps, args.sr, rng,
            jitter=args.jitter,
        )
        write_video(real_dir / f"real_{i:04d}.avi", frames, args.fps, pcm,
                    args.sr)

        env_a = speech_envelope(args.seconds, args.sr, rng)
        if args.hard_negatives and i % 2 == 0:
            # Time-shifted same envelope: correlated but out of sync.
            shift = int(rng.uniform(0.25, 0.8) * args.sr)
            env_v = np.roll(env_a, shift)
        else:
            env_v = speech_envelope(args.seconds, args.sr, rng)
        frames, pcm = render_clip(
            env_v, env_a, args.seconds, args.fps, args.sr, rng,
            jitter=args.jitter,
        )
        write_video(fake_dir / f"fake_{i:04d}.avi", frames, args.fps, pcm,
                    args.sr)
    print(f"Wrote {args.n_per_class} real + {args.n_per_class} fake clips "
          f"to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Measure the shared-track-encoding deviation and speedup.

`ScoringEngine(shared_visual_encoding=True)` encodes a track's frames once
and gathers per-window visual features instead of re-encoding every
75%-overlapping window (engine.py track_forward_shared). The only numeric
difference vs the reference-parity per-window path is temporal conv
padding: interior windows see real neighboring frames instead of zeros at
their window edges. This script quantifies that on realistic inputs —
synthetic talking-face tracks through the real full-size model — and
times both paths.

Usage:
    python scripts/eval_shared_encoding.py [--n-tracks 8] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-tracks", type=int, default=8)
    p.add_argument("--n-frames", type=int, default=120)
    p.add_argument("--stride", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO / "tests" / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from fixtures import speechish_pcm, synthetic_frames
    from lipsync_tpu.inference.engine import ScoringEngine
    from lipsync_tpu.models import LipSyncModel, ModelConfig
    from lipsync_tpu.preprocessing.audio import preprocess_audio_pcm

    cfg = ModelConfig()
    on_tpu = jax.devices()[0].platform != "cpu"
    model = LipSyncModel(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    cpu = jax.local_devices(backend="cpu")[0]
    v0 = jnp.zeros((1, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3))
    a0 = jnp.zeros((1, cfg.mel_bins, cfg.audio_frames, 1))
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(args.seed), v0, a0)
    variables = jax.device_put(variables, jax.devices()[0])

    windowed = ScoringEngine(variables, cfg)
    shared = ScoringEngine(variables, cfg, shared_visual_encoding=True)

    rng = np.random.RandomState(args.seed)
    diffs, t_windowed, t_shared = [], [], []
    n_windows_total = 0
    for k in range(args.n_tracks):
        # Face-like moving content (not iid noise): synthetic frames
        # resized crops + speech-band mel, the same fixtures the predictor
        # tests run on.
        frames = synthetic_frames(args.n_frames, seed=args.seed + k,
                                  h=cfg.crop_size, w=cfg.crop_size)
        crops = np.ascontiguousarray(frames)
        pcm = speechish_pcm(args.n_frames / 15.0, seed=args.seed + k)
        mel = preprocess_audio_pcm(pcm)
        starts = list(range(0, args.n_frames - cfg.video_frames + 1,
                            args.stride))
        mel_hz, fps = 100.0, 15.0
        audio_w = np.stack([
            _mel_window(mel, s, fps, mel_hz, cfg.audio_frames)
            for s in starts
        ])
        n_windows_total += len(starts)

        t0 = time.perf_counter()
        p_w = windowed.score_track_probs(crops, starts, audio_w)
        t_windowed.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        p_s = shared.score_track_probs(crops, starts, audio_w)
        t_shared.append(time.perf_counter() - t0)
        diffs.append(np.abs(p_w - p_s))

    d = np.concatenate(diffs)
    # First-call timings are compile; drop them for the speed comparison.
    tw = np.asarray(t_windowed[1:] or t_windowed)
    ts = np.asarray(t_shared[1:] or t_shared)
    report = {
        "platform": jax.devices()[0].platform,
        "n_tracks": args.n_tracks,
        "n_frames_per_track": args.n_frames,
        "n_windows": int(n_windows_total),
        "prob_abs_diff": {
            "max": round(float(d.max()), 4),
            "mean": round(float(d.mean()), 4),
            "p95": round(float(np.percentile(d, 95)), 4),
        },
        "windowed_s_per_track_p50": round(float(np.median(tw)), 3),
        "shared_s_per_track_p50": round(float(np.median(ts)), 3),
        "speedup": round(float(np.median(tw) / np.median(ts)), 2),
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        args.out.write_text(text)
    return 0


def _mel_window(mel, start_frame, fps, mel_hz, audio_frames):
    """Aligned mel window for a video window start (predictor geometry)."""
    m0 = int(round(start_frame / fps * mel_hz))
    win = mel[:, m0 : m0 + int(32 / fps * mel_hz)]
    # Resample to audio_frames columns (reference dataset.py:426-448).
    if win.shape[1] < 2:
        return np.zeros((mel.shape[0], audio_frames), np.float32)
    xs = np.linspace(0, win.shape[1] - 1, audio_frames)
    lo = np.floor(xs).astype(int)
    hi = np.minimum(lo + 1, win.shape[1] - 1)
    frac = xs - lo
    return (win[:, lo] * (1 - frac) + win[:, hi] * frac).astype(np.float32)


if __name__ == "__main__":
    raise SystemExit(main())

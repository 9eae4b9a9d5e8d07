"""Predictor end-to-end latency: pipelined vs serialized long-video path.

Quantifies the round-2 detection/scoring overlap
(`lipsync_tpu/inference/pipelined.py`): the same clips are scored twice
through `Predictor.predict`, once with `pipelined_long_video=True`
(host face detection overlapped with async device dispatch) and once with
the round-1 serialized path (detect ALL frames, then score). Reference
comparison point: ~3 s/video (reference README.md:128).

Usage:
    python scripts/bench_predictor.py --model-path /path/to/ckpt \
        [--n-clips 6 --clip-seconds 6 --repeats 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main(argv=None) -> int:
    from fixtures import speechish_pcm, synthetic_frames
    from lipsync_tpu.inference.predictor import Predictor, PredictorConfig
    from lipsync_tpu.preprocessing.mux import write_video

    p = argparse.ArgumentParser()
    p.add_argument("--model-path", type=Path, required=True)
    p.add_argument("--n-clips", type=int, default=6)
    p.add_argument("--clip-seconds", type=float, default=6.0)
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args(argv)

    tmp = Path(tempfile.mkdtemp())
    clips = []
    for i in range(args.n_clips):
        frames = synthetic_frames(int(args.clip_seconds * 15), seed=i)
        pcm = speechish_pcm(args.clip_seconds, seed=i)
        clips.append(write_video(tmp / f"clip_{i}.avi", frames, 15.0, pcm,
                                 16000))

    results = {}
    predictors = {}
    for name, flag in (("pipelined", True), ("serialized", False)):
        cfg = PredictorConfig(pipelined_long_video=flag)
        pred = predictors[name] = Predictor(model_path=args.model_path,
                                            config=cfg)
        pred.predict(clips[0])  # warm: compiles the window shapes
        lats = []
        for _ in range(args.repeats):
            for c in clips:
                t0 = time.perf_counter()
                pred.predict(c)
                lats.append(time.perf_counter() - t0)
        lat = np.sort(np.asarray(lats))
        results[name] = {
            "p50_s": round(float(np.percentile(lat, 50)), 3),
            "p90_s": round(float(np.percentile(lat, 90)), 3),
            "mean_s": round(float(lat.mean()), 3),
            "n": len(lats),
        }
    for pred in predictors.values():
        pred.close()

    out = {
        "metric": "predict_p50_s",
        "value": results["pipelined"]["p50_s"],
        "unit": "s/clip",
        "clip_seconds": args.clip_seconds,
        "pipelined": results["pipelined"],
        "serialized": results["serialized"],
        "speedup_p50": round(
            results["serialized"]["p50_s"]
            / max(results["pipelined"]["p50_s"], 1e-9), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

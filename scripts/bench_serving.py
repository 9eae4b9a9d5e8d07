"""Serving throughput benchmark (BASELINE config #5).

Replays a set of synthetic clips against the live HTTP service at fixed
concurrency and reports QPS + latency percentiles. Use ``--stub-model`` to
measure the serving stack alone, or give ``--model-path`` to run the full
TPU pipeline.

Usage:
    python scripts/bench_serving.py --requests 50 --concurrency 4 \
        [--model-path weights/best_model_accuracy | --stub-model]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def make_clips(n_clips: int, seconds: float, out_dir: Path):
    from fixtures import speechish_pcm, synthetic_frames
    from lipsync_tpu.preprocessing.mux import write_video

    clips = []
    for i in range(n_clips):
        frames = synthetic_frames(int(seconds * 15), seed=i)
        pcm = speechish_pcm(seconds, seed=i)
        clips.append(
            write_video(out_dir / f"clip_{i}.avi", frames, 15.0, pcm, 16000)
        )
    return clips


class _StubPredictor:
    def predict(self, path):
        return {
            "verdict": "real", "is_real": True, "is_fake": False,
            "confidence": 0.9, "manipulation_probability": 0.1,
        }

    def close(self):
        pass


def main(argv=None):
    import httpx

    from lipsync_tpu.serving.app import AppState, Server
    from lipsync_tpu.serving.config import Settings

    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=50)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--clip-seconds", type=float, default=3.0)
    p.add_argument("--n-clips", type=int, default=8)
    p.add_argument("--model-path", type=Path, default=None)
    p.add_argument("--stub-model", action="store_true")
    p.add_argument("--detection-stride", type=int, default=1,
                   help="host detector stride (Settings.detection_stride)")
    args = p.parse_args(argv)

    tmp = Path(tempfile.mkdtemp())
    clips = make_clips(args.n_clips, args.clip_seconds, tmp)
    payloads = [c.read_bytes() for c in clips]

    settings = Settings(
        port=0, run_embedded_worker=False,
        sqlite_db_path=str(tmp / "jobs.db"),
        model_path=args.model_path or Path("/nonexistent"),
        detection_stride=args.detection_stride,
    )
    predictor = _StubPredictor() if args.stub_model else None
    state = AppState(settings=settings, predictor=predictor)
    server = Server(state, load_model=not args.stub_model)
    if server.state.predictor is None:
        raise SystemExit("No model available; pass --model-path or --stub-model")
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"

    latencies = []
    errors = [0]
    lock = threading.Lock()
    counter = iter(range(args.requests))

    def worker():
        client = httpx.Client(base_url=base, timeout=300.0)
        while True:
            with lock:
                try:
                    i = next(counter)
                except StopIteration:
                    return
            body = payloads[i % len(payloads)]
            t0 = time.perf_counter()
            r = client.post(
                "/api/lip-sync",
                files={"video_file": ("c.avi", body, "video/avi")},
            )
            dt = time.perf_counter() - t0
            with lock:
                if r.status_code == 200:
                    latencies.append(dt)
                else:
                    errors[0] += 1

    # Warm one request (compiles the model shapes).
    httpx.Client(base_url=base, timeout=600.0).post(
        "/api/lip-sync",
        files={"video_file": ("c.avi", payloads[0], "video/avi")},
    )

    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=worker) for _ in range(args.concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    server.stop()

    lat = np.asarray(sorted(latencies))
    out = {
        "metric": "serving_qps",
        "value": round(len(lat) / wall, 2),
        "unit": "requests/sec",
        "requests": len(lat),
        "errors": errors[0],
        "concurrency": args.concurrency,
        "clip_seconds": args.clip_seconds,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1) if len(lat) else None,
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1) if len(lat) else None,
        "stub_model": bool(args.stub_model),
        "detection_stride": args.detection_stride,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

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


def engine_only_bench(args, engine=None):
    """Concurrent scoring with PRE-DECODED inputs: isolates cross-request
    batching behavior from this box's 1-core host decode limit (r3 VERDICT
    item 7). Each simulated request scores ``--windows-per-request``
    model windows (a short 2-track clip with refinement scores ~4-10);
    ``--coalesce on`` merges concurrent requests into shared forwards.

    ``engine`` lets a caller (scripts/bench_coalesce_r5.py) reuse ONE
    loaded engine across a whole A/B matrix — checkpoint restore + jit
    warm-up costs minutes per process on the tunneled dev box."""
    from lipsync_tpu.inference.batcher import CoalescingEngine
    from lipsync_tpu.inference.engine import load_engine

    shared = engine is not None
    if not shared:
        engine = load_engine(args.model_path)
    coalesce = args.coalesce == "on"
    if coalesce:
        engine = CoalescingEngine(
            engine, max_wait_ms=args.coalesce_wait_ms
        )
    w = args.windows_per_request
    rng = np.random.RandomState(0)
    visual = rng.randint(
        0, 256,
        size=(w, engine.config.video_frames, engine.config.crop_size,
              engine.config.crop_size, 3),
    ).astype(np.uint8)
    audio = rng.randn(
        w, engine.config.mel_bins, engine.config.audio_frames
    ).astype(np.float32) * 20.0 - 40.0

    # Warm EVERY bucket shape this run can reach: a request is w windows,
    # so coalesced batches land on the power-of-two buckets up to
    # concurrency*w. Each fresh bucket costs minutes through the remote
    # compile service — that's deployment warmup, not steady-state QPS.
    max_total = min(256, args.concurrency * w)
    base = engine._engine if coalesce else engine
    nb = 1
    while nb < max_total * 2 and nb <= 256:
        if nb * 2 >= w:  # buckets a w-window request can land on
            reps = (nb + w - 1) // w
            vb = np.repeat(visual, reps, axis=0)[:nb]
            ab = np.repeat(audio, reps, axis=0)[:nb]
            base.score_probs(vb, ab)
        nb *= 2

    lock = threading.Lock()
    counter = iter(range(args.requests))
    latencies = []

    def worker():
        while True:
            with lock:
                try:
                    next(counter)
                except StopIteration:
                    return
            t0 = time.perf_counter()
            engine.score_probs(visual, audio)
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=worker) for _ in range(args.concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = np.asarray(sorted(latencies))
    out = {
        "metric": "engine_concurrent_qps",
        "value": round(len(lat) / wall, 2),
        "unit": "requests/sec",
        "windows_per_sec": round(len(lat) * w / wall, 1),
        "requests": len(lat),
        "concurrency": args.concurrency,
        "windows_per_request": w,
        "coalesce": coalesce,
        "coalesce_wait_ms": args.coalesce_wait_ms if coalesce else None,
        "batches_dispatched": getattr(engine, "batches_dispatched", None),
        "items_coalesced": getattr(engine, "items_coalesced", None),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
    }
    if coalesce:
        engine.close()
    print(json.dumps(out))
    return out


def main(argv=None):
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
    p.add_argument("--coalesce", choices=["on", "off"], default="on",
                   help="cross-request dynamic batching "
                        "(Settings.coalesce_requests)")
    p.add_argument("--coalesce-wait-ms", type=float, default=2.0)
    p.add_argument("--engine-only", action="store_true",
                   help="skip HTTP/decode: concurrent scoring of "
                        "pre-decoded windows (isolates batching from the "
                        "1-core host)")
    p.add_argument("--windows-per-request", type=int, default=6)
    args = p.parse_args(argv)

    if args.engine_only:
        if args.model_path is None:
            raise SystemExit("--engine-only requires --model-path")
        return engine_only_bench(args)

    import httpx

    tmp = Path(tempfile.mkdtemp())
    clips = make_clips(args.n_clips, args.clip_seconds, tmp)
    payloads = [c.read_bytes() for c in clips]

    settings = Settings(
        port=0, run_embedded_worker=False,
        sqlite_db_path=str(tmp / "jobs.db"),
        model_path=args.model_path or Path("/nonexistent"),
        detection_stride=args.detection_stride,
        coalesce_requests=args.coalesce == "on",
        coalesce_max_wait_ms=args.coalesce_wait_ms,
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
        "coalesce": args.coalesce == "on",
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

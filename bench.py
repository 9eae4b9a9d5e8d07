"""Benchmark driver: windows/sec/chip on the flagship model.

Measures batched 2 s-window scoring throughput (the long-video sliding-
window engine's inner loop — the reference runs these windows as sequential
batch-1 torch calls at ~3 s/video ≈ 17 windows/s, README.md:128) plus
single-window p50 latency. Prints ONE JSON line.

vs_baseline is reported against the BASELINE.json north-star of
100 windows/sec/chip on v5e-1.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _measure(fwd, visual, audio, iters):
    jax.block_until_ready(fwd(visual, audio))  # compile/warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(visual, audio))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    from lipsync_tpu.models import LipSyncModel, ModelConfig

    cfg = ModelConfig()
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = LipSyncModel(cfg, dtype=dtype)

    throughput_batch = 512 if on_tpu else 2
    rng = np.random.RandomState(0)

    def inputs(batch):
        v = jnp.asarray(
            rng.rand(batch, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3),
            jnp.float32,
        )
        a = jnp.asarray(
            rng.rand(batch, cfg.mel_bins, cfg.audio_frames, 1) * 80.0 - 80.0,
            jnp.float32,
        )
        return v, a

    v1, a1 = inputs(1)
    variables = model.init(jax.random.PRNGKey(0), v1, a1)
    fwd = jax.jit(lambda v, a: model.apply(variables, v, a))

    iters = 20 if on_tpu else 3
    p50_single = _measure(fwd, v1, a1, iters)
    vb, ab = inputs(throughput_batch)
    p50_batch = _measure(fwd, vb, ab, iters)

    windows_per_sec = throughput_batch / p50_batch
    target = 100.0  # BASELINE.json north star
    print(
        json.dumps(
            {
                "metric": "windows_per_sec_per_chip",
                "value": round(windows_per_sec, 2),
                "unit": "2s-windows/sec",
                "vs_baseline": round(windows_per_sec / target, 3),
                "p50_single_window_ms": round(p50_single * 1e3, 2),
                "p50_batch_latency_ms": round(p50_batch * 1e3, 2),
                "batch": throughput_batch,
                "dtype": str(dtype.__name__),
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()

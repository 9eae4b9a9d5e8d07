"""Benchmark driver: windows/sec/chip on the flagship model.

Measures batched 2 s-window scoring throughput (the long-video sliding-
window engine's inner loop — the reference runs these windows as sequential
batch-1 torch calls at ~3 s/video, README.md:128) and p50 per-window
latency. Prints ONE JSON line.

Baseline derivation: the reference's ~3 s/video GPU number over a ~30 s
video with stride-8 windows (~52 windows) ≈ 17 windows/sec. The BASELINE
north-star for this build is ≥100 windows/sec/chip on v5e-1; vs_baseline is
reported against that 100 w/s target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from lipsync_tpu.models import LipSyncModel, ModelConfig

    cfg = ModelConfig()
    on_tpu = jax.devices()[0].platform != "cpu"
    # bf16 compute on TPU (MXU-native); fp32 on CPU fallback.
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = LipSyncModel(cfg, dtype=dtype)

    batch = 32 if on_tpu else 2
    rng = np.random.RandomState(0)
    visual = jnp.asarray(
        rng.rand(batch, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3),
        jnp.float32,
    )
    audio = jnp.asarray(
        rng.rand(batch, cfg.mel_bins, cfg.audio_frames, 1) * 80.0 - 80.0,
        jnp.float32,
    )

    variables = model.init(jax.random.PRNGKey(0), visual[:1], audio[:1])
    fwd = jax.jit(lambda v, a: model.apply(variables, v, a))

    # Warmup / compile.
    jax.block_until_ready(fwd(visual, audio))

    iters = 20 if on_tpu else 3
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(visual, audio))
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    windows_per_sec = batch / p50
    target = 100.0  # BASELINE.json north star: >=100 windows/sec/chip
    print(
        json.dumps(
            {
                "metric": "windows_per_sec_per_chip",
                "value": round(windows_per_sec, 2),
                "unit": "2s-windows/sec",
                "vs_baseline": round(windows_per_sec / target, 3),
                "p50_batch_latency_ms": round(p50 * 1e3, 2),
                "batch": batch,
                "dtype": str(dtype.__name__),
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()

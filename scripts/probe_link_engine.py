"""Interleaved link-vs-engine utilization probe.

The tunneled host->device link on this box drifts by up to 10x within
minutes (measured 41-425 MB/s on 2026-08-18), so `bench.py`'s
`engine_link_utilization` — engine throughput divided by a ceiling
computed from a link probe taken at a DIFFERENT moment — can be skewed
arbitrarily by drift. This probe alternates, back to back per iteration:

  1. a raw flat uint8 upload of the engine payload's visual bytes
     (pure link, no model), and
  2. `ScoringEngine.score_logits` on the same payload (pad + upload +
     forward + readback with double-buffered group streaming,
     engine.py max_in_flight),

so each iteration's utilization ratio compares the engine against the
link rate measured seconds earlier. Reference behavior being certified:
the batched scoring path of the reference's predictor loop
(app/inference/predictor.py:530-620) re-designed as streamed groups.

Usage: python scripts/probe_link_engine.py [--batch 128] [--groups 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_CACHE = Path(__file__).resolve().parent.parent / "tests" / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lipsync_tpu.inference.engine import ScoringEngine  # noqa: E402
from lipsync_tpu.models import LipSyncModel, ModelConfig  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    cfg = ModelConfig()
    rng = np.random.RandomState(0)
    model = LipSyncModel(cfg, dtype=jnp.bfloat16)

    # Init on the host CPU backend (a remote-TPU init compile costs
    # minutes); ship params over once.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        v0 = jnp.zeros(
            (1, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3),
            jnp.float32)
        a0 = jnp.zeros((1, cfg.mel_bins, cfg.audio_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), v0, a0)
    variables = jax.device_put(variables, jax.devices()[0])
    engine = ScoringEngine(variables, cfg, max_batch=args.batch)

    n = args.groups * args.batch
    veh = (rng.rand(n, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3)
           * 255).astype(np.uint8)
    aeh = (rng.rand(n, cfg.mel_bins, cfg.audio_frames) * 80 - 80
           ).astype(np.float32)
    mb = veh.nbytes / 1e6 + aeh.nbytes / 1e6
    print(f"payload {mb:.0f} MB ({n} windows, platform "
          f"{jax.devices()[0].platform})", flush=True)

    t0 = time.perf_counter()
    engine.score_logits(veh[: args.batch], aeh[: args.batch])
    print(f"engine warm (compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    flat = veh.reshape(-1)
    jax.block_until_ready(jnp.asarray(flat))

    utils = []
    for it in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(flat))
        t_raw = time.perf_counter() - t0
        t0 = time.perf_counter()
        engine.score_logits(veh, aeh)
        t_eng = time.perf_counter() - t0
        rate = veh.nbytes / 1e6 / t_raw
        ceil = n / (mb / rate)
        util = (n / t_eng) / ceil
        utils.append(util)
        print(f"iter {it}: raw {t_raw:6.2f}s ({rate:6.1f} MB/s) | "
              f"engine {t_eng:6.2f}s ({n / t_eng:6.1f} w/s) | "
              f"ceiling {ceil:6.1f} w/s | util {util:.3f}", flush=True)
    print(f"median interleaved utilization: {np.median(utils):.3f}")


if __name__ == "__main__":
    main()

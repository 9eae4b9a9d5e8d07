"""A/B throughput of the fp (bf16) vs int8-conv model forward.

Measures the flagship forward at a fixed batch under both conv lowerings
(`ModelConfig.conv_lowering`), plus max |dprob| between them on the same
random batch. The int8 path targets the v5e MXU's 2x-bf16 int8 peak
(layers.Int8Conv); this prints what that buys end to end, since only the
encoder convs quantize (attention/MLP stages stay bf16).

Usage: python scripts/bench_int8.py [--batch 512] [--tiny]
(--tiny swaps in the test-sized config for CPU smoke runs.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / "tests" / ".jax_cache"),
    )
    from lipsync_tpu.models import LipSyncModel, ModelConfig

    cfg = ModelConfig()
    if args.tiny:
        cfg = dataclasses.replace(
            cfg, video_frames=8, crop_size=32, audio_frames=32
        )
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    rng = np.random.RandomState(0)
    v = rng.rand(args.batch, cfg.video_frames, cfg.crop_size,
                 cfg.crop_size, 3).astype(np.float32)
    a = (rng.rand(args.batch, cfg.mel_bins, cfg.audio_frames, 1) * 80
         - 80).astype(np.float32)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = LipSyncModel(cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(v[:1]), jnp.asarray(a[:1])
        )
    variables = jax.device_put(variables, jax.devices()[0])
    vd, ad = jnp.asarray(v), jnp.asarray(a)

    out = {"batch": args.batch, "platform": platform,
           "dtype": str(dtype.__name__)}
    probs = {}
    for lowering in ("conv", "int8"):
        model = LipSyncModel(
            dataclasses.replace(cfg, conv_lowering=lowering), dtype=dtype
        )
        fwd = jax.jit(lambda vv, aa, m=model: m.apply(variables, vv, aa))
        np.asarray(fwd(vd, ad))  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            logits = np.asarray(fwd(vd, ad))
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        out[f"{lowering}_p50_ms"] = round(p50 * 1e3, 2)
        out[f"{lowering}_windows_per_sec"] = round(args.batch / p50, 2)
        probs[lowering] = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    out["speedup"] = round(
        out["int8_windows_per_sec"] / out["conv_windows_per_sec"], 3
    )
    out["max_dprob"] = round(
        float(np.abs(probs["conv"] - probs["int8"]).max()), 5
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

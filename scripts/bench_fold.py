"""A/B of the HF-stem Laplacian fold (`ModelConfig.hf_stem_fold`).

The artifact branch's high-frequency detector runs a fixed per-frame
Laplacian then a 3->32 Conv3d (reference app/models/artifact_detector.py:24-62).
`_FoldedStemConvBN` composes the pair into ONE (3,5,5) conv at trace time
(models/artifact.py). This measures what that buys end to end — full-model
forward p50 both ways at a serving batch — plus the numeric deviation
max |dprob| between the lowerings on the same batch (the fold's border
rows/cols see a different implicit padding; see tests/test_ops.py
test_hf_stem_fold_model_logits_close).

With --model-path the A/B runs on TRAINED weights (orbax dir or torch
.pth), which is the deviation number serving actually cares about
(ADVICE r3: random-weight deviation at 32 px does not bound trained
weights at production geometry).

Usage: python scripts/bench_fold.py [--batch 256] [--model-path DIR] [--tiny]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model-path", type=Path, default=None,
                    help="trained weights (orbax dir or torch .pth); "
                         "default: random init")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is "
                         "overridden by the axon sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
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

    if args.model_path is not None:
        from lipsync_tpu.inference.engine import load_engine

        variables = load_engine(args.model_path, config=cfg).variables
    else:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = LipSyncModel(cfg).init(
                jax.random.PRNGKey(0), jnp.asarray(v[:1]), jnp.asarray(a[:1])
            )
    variables = jax.device_put(variables, jax.devices()[0])
    vd, ad = jnp.asarray(v), jnp.asarray(a)

    out = {"batch": args.batch, "platform": platform,
           "dtype": str(dtype.__name__),
           "weights": str(args.model_path) if args.model_path else "random"}
    probs = {}
    for name, fold in (("sequential", False), ("folded", True)):
        model = LipSyncModel(
            dataclasses.replace(cfg, hf_stem_fold=fold), dtype=dtype
        )
        fwd = jax.jit(lambda vv, aa, m=model: m.apply(variables, vv, aa))
        np.asarray(fwd(vd, ad))  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            logits = np.asarray(fwd(vd, ad))
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        out[f"{name}_p50_ms"] = round(p50 * 1e3, 2)
        out[f"{name}_windows_per_sec"] = round(args.batch / p50, 2)
        probs[name] = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    out["speedup"] = round(
        out["folded_windows_per_sec"] / out["sequential_windows_per_sec"], 3
    )
    dp = np.abs(probs["sequential"] - probs["folded"])
    out["max_dprob"] = round(float(dp.max()), 6)
    out["mean_dprob"] = round(float(dp.mean()), 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

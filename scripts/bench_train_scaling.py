"""Train-step batch-scaling curve: step ms / clips/s / MFU vs batch size.

VERDICT r4 item 6: train MFU at the canonical batch 32 is 0.06 — the
forward/backward is dominated by per-step overheads (dispatch, small-op
launch, optimizer) rather than MXU work, and the regen recipes never
acted on bench.py's own conclusion ("large-run recipes should scale the
batch, not the step count"). This sweep measures the production train
step (phase-3 optimizer, on-device augmentation, device-resident uint8
batch — the ``--device-cache`` steady state) at batch {32..512} so the
knee can be adopted by `scripts/regen_r4.sh` / `train_union_flagship.sh`.

Each batch size gets a FRESH TrainState: the jitted step donates its
state buffers, so reusing one state across sizes dies on donated-buffer
reuse (measured in the r5 verify drive).

Usage:
    JAX_PLATFORMS=tpu python scripts/bench_train_scaling.py \
        [--batches 32,64,128,256,512] [--out docs/eval/train_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="32,64,128,256,512")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--out", type=Path, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the TPU alone)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache_dir = str(REPO / "tests" / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lipsync_tpu.models import LipSyncModel, ModelConfig
    from lipsync_tpu.ops.augment import AugmentConfig
    from lipsync_tpu.training.optimizers import make_phase_optimizer
    from lipsync_tpu.training.steps import TrainState, make_train_step

    cfg = ModelConfig()
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    peak = 197e12 if on_tpu else 0.0  # v5e bf16 public spec

    model = LipSyncModel(cfg, dtype=dtype)
    optimizer = make_phase_optimizer(3, lr_head=1e-4, lr_encoder=1e-4)

    rng = np.random.RandomState(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3),
                      jnp.float32),
            jnp.zeros((1, cfg.mel_bins, cfg.audio_frames, 1), jnp.float32),
        )
    variables = jax.device_put(variables, jax.devices()[0])
    train_step = jax.jit(
        make_train_step(model, optimizer, augment_cfg=AugmentConfig())
    )

    rows = []
    for batch in [int(b) for b in args.batches.split(",")]:
        print(f"[scaling] batch {batch}: staging ...",
              file=sys.stderr, flush=True)
        v = (rng.rand(batch, cfg.video_frames, cfg.crop_size, cfg.crop_size,
                      3) * 255).astype(np.uint8)
        a = (rng.rand(batch, cfg.mel_bins, cfg.audio_frames, 1) * 80.0
             - 80.0).astype(np.float32)
        lab = (rng.rand(batch) > 0.5).astype(np.float32)
        batch_dev = {
            "visual": jnp.asarray(v),
            "audio": jnp.asarray(a),
            "label": jnp.asarray(lab),
        }
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(variables["params"]),
            rng=jax.random.PRNGKey(7),
        )
        flops = 0.0
        hbm_bytes = 0.0
        try:
            compiled = train_step.lower(state, batch_dev).compile()
            analysis = compiled.cost_analysis()
            if isinstance(analysis, (list, tuple)):
                analysis = analysis[0]
            flops = float(analysis.get("flops", 0.0))
            hbm_bytes = float(analysis.get("bytes accessed", 0.0))
        except Exception:
            pass

        # Warm (compile); then measure. The step donates `state`, so
        # thread the returned state through the loop.
        try:
            t0 = time.perf_counter()
            state, m = train_step(state, batch_dev)
            np.asarray(m["loss"])
            compile_s = time.perf_counter() - t0
        except Exception as e:  # v5e-1 HBM OOM at batch 512 — record it
            msg = str(e).splitlines()[0][:200]
            print(f"[scaling] batch {batch}: FAILED ({msg})",
                  file=sys.stderr, flush=True)
            rows.append({"batch": batch, "error": msg})
            del state, batch_dev
            continue
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            state, m = train_step(state, batch_dev)
            np.asarray(m["loss"])
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        row = {
            "batch": batch,
            "step_ms": round(p50 * 1e3, 2),
            "clips_per_sec": round(batch / p50, 1),
            "mfu": round(flops / p50 / peak, 4) if peak and flops else None,
            "flops_per_step": round(flops) if flops else None,
            # XLA's "bytes accessed" is the compiler's HBM traffic estimate;
            # against the v5e public 819 GB/s this prices whether the step is
            # bandwidth-bound (hbm_util ~1 means speed-of-light on HBM).
            "hbm_bytes_per_step": round(hbm_bytes) if hbm_bytes else None,
            "hbm_util": (round(hbm_bytes / p50 / 819e9, 3)
                         if on_tpu and hbm_bytes else None),
            "first_call_s": round(compile_s, 1),
        }
        print(f"[scaling] {row}", file=sys.stderr, flush=True)
        rows.append(row)
        del state, batch_dev

    out = {"platform": platform, "dtype": dtype.__name__, "rows": rows}
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        args.out.write_text(text)


if __name__ == "__main__":
    main()

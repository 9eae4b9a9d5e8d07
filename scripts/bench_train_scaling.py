"""Train-step batch-scaling sweep on the production --device-cache path.

r4 VERDICT weak item 6: train MFU sat at 0.06 at the canonical batch 32
and every training recipe (scripts/regen_r4.sh, train_interference_r4.sh)
inherited that batch unmeasured — the bench's own conclusion ("large-run
recipes should scale the batch, not the step count") was never tested.
This sweeps the REAL jitted train step (two forwards + three losses +
optimizer + on-device augmentation, lipsync_tpu/training/steps.py) over
the HBM-resident corpus sampler (training/device_cache.py) at batch
{32..512}, reporting steady-state step latency, clips/s, and MFU from
XLA's compiled cost analysis, so recipes can adopt the knee.

The reference trains at a fixed batch with no scaling study
(`/root/reference/app/training/train.py:318-722`).

Usage:
    python scripts/bench_train_scaling.py \
        --preprocessed-dir /tmp/r4ph_train_pre \
        --batches 32,64,128,256,512 \
        --output docs/eval/train_scaling.json
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


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preprocessed-dir", type=Path, required=True,
                   help="full_sequence preprocessed corpus "
                        "(precompute_training_tensors.py)")
    p.add_argument("--batches", default="32,64,128,256,512")
    p.add_argument("--steps", type=int, default=12,
                   help="measured steady-state steps per batch size")
    p.add_argument("--output", type=Path,
                   default=Path("docs/eval/train_scaling.json"))
    args = p.parse_args(argv)
    batch_sizes = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from lipsync_tpu.models import LipSyncModel, ModelConfig
    from lipsync_tpu.ops.augment import AugmentConfig
    from lipsync_tpu.training.data import LipSyncDataset
    from lipsync_tpu.training.device_cache import DeviceDatasetCache
    from lipsync_tpu.training.optimizers import make_phase_optimizer
    from lipsync_tpu.training.steps import (
        LossConfig,
        create_train_state,
        make_train_step,
    )
    from lipsync_tpu.utils.device import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    platform = jax.devices()[0].platform
    peak = {"tpu": 197e12}.get("tpu" if platform != "cpu" else "cpu", 1e11)

    cfg = ModelConfig()
    model = LipSyncModel(cfg)
    dataset = LipSyncDataset(
        preprocessed_dir=args.preprocessed_dir, uint8_visual=True
    )
    cache = DeviceDatasetCache(dataset)
    idx = list(range(len(dataset)))

    # Phase-3 (full unfreeze) optimizer — the regime every long recipe
    # spends its epochs in.
    optimizer = make_phase_optimizer(3, 1e-4, 1e-4, kind="adam")
    example = (
        jnp.zeros((1, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3)),
        jnp.zeros((1, cfg.mel_bins, cfg.audio_frames, 1)),
    )
    train_step = jax.jit(
        make_train_step(
            model, optimizer, LossConfig(), augment_cfg=AugmentConfig()
        ),
        donate_argnums=(0,),
    )

    rows = []
    for bs in batch_sizes:
        if bs > len(idx):
            print(f"[scaling] skip batch {bs} > corpus {len(idx)}",
                  file=sys.stderr)
            continue
        # Fresh state per shape: donate_argnums consumes the previous
        # sweep's buffers.
        state = create_train_state(
            model, optimizer, jax.random.PRNGKey(0), example
        )
        rng = np.random.RandomState(bs)
        n_steps = args.steps + 3  # 3 warmups (compile + donation settle)
        times, flops = [], 0.0
        measured = 0
        t_compile0 = time.perf_counter()
        compile_s = None
        while measured < n_steps:
            for batch in cache.batches(idx, bs, rng=rng, train_mode=True):
                if measured == 0:
                    try:
                        lowered = train_step.lower(state, batch).compile()
                        analysis = lowered.cost_analysis()
                        if isinstance(analysis, (list, tuple)):
                            analysis = analysis[0]
                        flops = float(analysis.get("flops", 0.0))
                    except Exception:
                        flops = 0.0
                    compile_s = time.perf_counter() - t_compile0
                t0 = time.perf_counter()
                state, metrics = train_step(state, batch)
                jax.block_until_ready(metrics["loss"])
                times.append(time.perf_counter() - t0)
                measured += 1
                if measured >= n_steps:
                    break
        steady = times[3:]
        step_s = float(np.median(steady))
        clips_s = bs / step_s
        mfu = (flops / step_s / peak) if flops else 0.0
        rows.append({
            "batch": bs,
            "step_ms": round(step_s * 1e3, 1),
            "clips_per_sec": round(clips_s, 1),
            "mfu": round(mfu, 4),
            "step_flops": flops,
            "compile_s": round(compile_s or 0.0, 1),
        })
        print(f"[scaling] batch {bs:4d}: {rows[-1]['step_ms']:8.1f} ms/step "
              f"{rows[-1]['clips_per_sec']:7.1f} clips/s MFU "
              f"{rows[-1]['mfu']:.3f}", file=sys.stderr)

    out = {
        "platform": platform,
        "corpus_clips": len(idx),
        "peak_flops": peak,
        "note": "jitted phase-3 train step, device-cache sampler, "
                "on-device augment; median of steady-state steps",
        "rows": rows,
    }
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

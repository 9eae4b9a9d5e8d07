"""From-scratch training CLI: ``python -m lipsync_tpu.training.train``.

Re-design of `/root/reference/app/training/train.py:318-722`:
BCE + 0.1 x cross-modal contrastive + 0.2 x sync contrastive, 3-phase
encoder freezing (head-only -> +audio@5 -> full@15 with encoder LR 1e-5),
Adam + ReduceLROnPlateau(0.5, 5), latest/best-loss/best-accuracy orbax
checkpoints with input-geometry metadata, accuracy early stopping, and
phase-aware optimizer rebuild on resume.

The whole step (two forwards + three losses + optimizer) is one jitted XLA
program; with >1 device the batch shards over the data mesh.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lipsync_tpu.models import LipSyncModel, ModelConfig
from lipsync_tpu.ops.augment import AugmentConfig
from lipsync_tpu.parallel import mesh as mesh_lib
from lipsync_tpu.training import checkpoints as ckpt_lib
from lipsync_tpu.training.data import (
    Augmentations,
    BatchLoader,
    LipSyncDataset,
)
from lipsync_tpu.training.losses import bce_with_logits
from lipsync_tpu.training.optimizers import (
    ReduceLROnPlateau,
    current_learning_rate,
    make_phase_optimizer,
)
from lipsync_tpu.training.steps import (
    LossConfig,
    TrainState,
    create_train_state,
    make_train_step,
)
from lipsync_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def phase_for_epoch(epoch: int, phase2_start: int, phase3_start: int) -> int:
    if epoch < phase2_start:
        return 1
    if epoch < phase3_start:
        return 2
    return 3


def make_eval_fn(model: LipSyncModel):
    @jax.jit
    def eval_step(params, batch_stats, visual, audio):
        if visual.dtype == jnp.uint8:
            visual = visual.astype(jnp.float32) / 255.0
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, visual, audio
        )
        return logits

    return eval_step


def validate(
    eval_fn, state: TrainState, loader: BatchLoader
) -> Dict[str, float]:
    """Per-class validation metrics (train.py:237-315)."""
    losses, correct, total = [], 0, 0
    class_correct = {0: 0, 1: 0}
    class_total = {0: 0, 1: 0}
    for batch in loader:
        logits = np.asarray(
            eval_fn(state.params, state.batch_stats,
                    jnp.asarray(batch["visual"]), jnp.asarray(batch["audio"]))
        )
        labels = np.asarray(batch["label"])
        losses.append(
            float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
        )
        preds = (1 / (1 + np.exp(-logits)) > 0.5).astype(np.float32)
        correct += int((preds == labels).sum())
        total += len(labels)
        for cls in (0, 1):
            mask = labels == cls
            class_correct[cls] += int((preds[mask] == cls).sum())
            class_total[cls] += int(mask.sum())
    return {
        "loss": float(np.mean(losses)) if losses else 0.0,
        "accuracy": correct / total if total else 0.0,
        "real_accuracy": (
            class_correct[1] / class_total[1] if class_total[1] else 0.0
        ),
        "fake_accuracy": (
            class_correct[0] / class_total[0] if class_total[0] else 0.0
        ),
    }


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the lip-sync model")
    p.add_argument("--data-dir", type=Path, default=None)
    p.add_argument("--preprocessed-dir", type=Path, default=None)
    p.add_argument("--output-dir", type=Path, default=Path("weights"))
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-encoder", type=float, default=1e-5)
    p.add_argument("--val-split", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--video-frames", type=int, default=32)
    p.add_argument("--audio-frames", type=int, default=128)
    p.add_argument("--crop-size", type=int, default=96)
    p.add_argument("--phase2-start-epoch", type=int, default=5)
    p.add_argument("--phase3-start-epoch", type=int, default=15)
    p.add_argument("--contrastive-weight", type=float, default=0.1)
    p.add_argument("--sync-weight", type=float, default=0.2)
    p.add_argument("--early-stopping-patience", type=int, default=None)
    p.add_argument("--resume", type=Path, default=None)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--device-augment", action="store_true",
                   help="Run augmentation ON DEVICE inside the jitted train "
                        "step (lipsync_tpu.ops.augment) instead of on the "
                        "host loader thread — removes the one-core host "
                        "bottleneck at large data scales")
    p.add_argument("--no-face-detection", action="store_true")
    p.add_argument("--device-cache", action="store_true",
                   help="Upload the whole preprocessed full_sequence "
                        "corpus to device memory once and gather training "
                        "windows ON DEVICE (training/device_cache.py): the "
                        "host ships only per-batch int32 index arrays, so "
                        "epochs stop being bound by the host link. Implies "
                        "--device-augment. Needs the corpus to fit in HBM "
                        "(~10 GB cap)")
    p.add_argument("--no-artifact-branch", action="store_true",
                   help="Train without the artifact detector "
                        "(ModelConfig.detect_artifacts=False — the "
                        "reference's detect_artifacts=True kwarg, "
                        "lip_sync_model.py:38; ablation diagnostics)")
    p.add_argument("--max-steps-per-epoch", type=int, default=None,
                   help="Debug cap on steps per epoch")
    return p


def run_training(args, detector_backend=None) -> Dict[str, float]:
    from lipsync_tpu.utils.device import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    cfg = ModelConfig(
        video_frames=args.video_frames,
        crop_size=args.crop_size,
        audio_frames=args.audio_frames,
        detect_artifacts=not getattr(args, "no_artifact_branch", False),
    )
    model = LipSyncModel(cfg)
    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh() if n_dev > 1 else None
    logger.info("Training on %d device(s)", n_dev)

    use_device_cache = bool(getattr(args, "device_cache", False))
    device_augment = (
        bool(getattr(args, "device_augment", False)) or use_device_cache
    )
    dataset = LipSyncDataset(
        data_dir=args.data_dir,
        preprocessed_dir=args.preprocessed_dir,
        video_frames=args.video_frames,
        audio_frames=args.audio_frames,
        detector_backend=detector_backend,
        require_face_detection=not args.no_face_detection,
        # With device-side augmentation the host ships raw uint8 windows.
        uint8_visual=device_augment,
    )
    n = len(dataset)
    rng = np.random.RandomState(args.seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * args.val_split)) if n > 1 else 0
    val_idx, train_idx = perm[:n_val].tolist(), perm[n_val:].tolist()
    logger.info("Dataset: %d samples (%d train / %d val)",
                n, len(train_idx), len(val_idx))

    cache = None
    if use_device_cache:
        if not dataset.use_preprocessed:
            raise SystemExit("--device-cache requires --preprocessed-dir")
        if mesh is not None and args.batch_size % n_dev != 0:
            raise SystemExit(
                f"--device-cache with a {n_dev}-device mesh needs "
                f"--batch-size divisible by {n_dev}"
            )
        from lipsync_tpu.training.device_cache import DeviceDatasetCache

        cache = DeviceDatasetCache(dataset, mesh=mesh)
        train_loader = val_loader = None
    else:
        use_host_augment = not args.no_augment and not device_augment
        train_loader = BatchLoader(
            dataset, batch_size=args.batch_size, shuffle=True,
            seed=args.seed, indices=train_idx,
            augment=Augmentations() if use_host_augment else None,
            train_mode_override=True,
        )
        val_loader = BatchLoader(
            dataset, batch_size=args.batch_size, shuffle=False,
            indices=val_idx, train_mode_override=False,
        )

    loss_cfg = LossConfig(
        contrastive_weight=args.contrastive_weight,
        sync_weight=args.sync_weight,
    )

    def build(phase: int, params=None, batch_stats=None) -> Tuple:
        optimizer = make_phase_optimizer(
            phase, args.lr, args.lr_encoder, kind="adam"
        )
        example = (
            jnp.zeros((1, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3)),
            jnp.zeros((1, cfg.mel_bins, cfg.audio_frames, 1)),
        )
        state = create_train_state(
            model, optimizer, jax.random.PRNGKey(args.seed), example
        )
        if params is not None:
            state = state.replace(params=params, batch_stats=batch_stats)
        aug_cfg = (
            AugmentConfig()
            if device_augment and not args.no_augment else None
        )
        # Donate the TrainState: params/opt-state/batch-stats buffers are
        # consumed and rewritten every step, so XLA reuses them in place
        # instead of holding old+new copies live (matters with a 7 GB
        # --device-cache corpus sharing HBM with the step).
        step = jax.jit(
            make_train_step(model, optimizer, loss_cfg, augment_cfg=aug_cfg),
            donate_argnums=(0,),
        )
        return optimizer, state, step

    start_epoch = 0
    best = {"loss": float("inf"), "accuracy": -1.0}
    if args.resume is not None:
        meta = ckpt_lib.load_metadata(args.resume)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best["loss"] = float(meta.get("best_val_loss", float("inf")))
        best["accuracy"] = float(meta.get("best_val_accuracy", -1.0))
        phase = phase_for_epoch(
            start_epoch, args.phase2_start_epoch, args.phase3_start_epoch
        )
        optimizer, state, train_step = build(phase)
        restored = ckpt_lib.load_checkpoint(
            args.resume,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        logger.info("Resumed from %s at epoch %d (phase %d)",
                    args.resume, start_epoch, phase)
    else:
        phase = phase_for_epoch(
            0, args.phase2_start_epoch, args.phase3_start_epoch
        )
        optimizer, state, train_step = build(phase)

    eval_fn = make_eval_fn(model)
    scheduler = ReduceLROnPlateau(factor=0.5, patience=5)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    epochs_without_improvement = 0
    history = {}

    for epoch in range(start_epoch, args.epochs):
        new_phase = phase_for_epoch(
            epoch, args.phase2_start_epoch, args.phase3_start_epoch
        )
        if new_phase != phase:
            logger.info("Phase transition %d -> %d (epoch %d): rebuilding "
                        "optimizer", phase, new_phase, epoch)
            phase = new_phase
            optimizer, state, train_step = build(
                phase, state.params, state.batch_stats
            )
            scheduler = ReduceLROnPlateau(factor=0.5, patience=5)

        t0 = time.time()
        losses, accs, steps = [], [], 0
        if cache is not None:
            # Per-epoch host RNG: only (batch,) index/start arrays cross
            # the host link; windows gather on device.
            batch_iter = cache.batches(
                train_idx, args.batch_size,
                rng=np.random.RandomState(args.seed * 100003 + epoch),
                train_mode=True,
            )
        else:
            batch_iter = train_loader
        for batch in batch_iter:
            if cache is not None:
                jb = batch  # already on device (padded/masked/sharded)
            elif mesh is not None:
                batch = mesh_lib.pad_batch_to_multiple(batch, n_dev)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                jb = mesh_lib.shard_batch(jb, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = train_step(state, jb)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["accuracy"]))
            steps += 1
            if (
                args.max_steps_per_epoch is not None
                and steps >= args.max_steps_per_epoch
            ):
                break
        train_loss = float(np.mean(losses)) if losses else 0.0
        train_acc = float(np.mean(accs)) if accs else 0.0

        val_iter = (
            cache.batches(val_idx, args.batch_size, train_mode=False)
            if cache is not None else val_loader
        )
        val = validate(eval_fn, state, val_iter) if val_idx else {
            "loss": train_loss, "accuracy": train_acc,
            "real_accuracy": 0.0, "fake_accuracy": 0.0,
        }
        lr_now = current_learning_rate(state.opt_state)
        logger.info(
            "Epoch %d (phase %d): train_loss=%.4f train_acc=%.2f%% "
            "val_loss=%.4f val_acc=%.2f%% (real=%.2f%% fake=%.2f%%) "
            "lr=%.2e %.1fs",
            epoch, phase, train_loss, train_acc * 100, val["loss"],
            val["accuracy"] * 100, val["real_accuracy"] * 100,
            val["fake_accuracy"] * 100, lr_now or 0.0, time.time() - t0,
        )
        state = state.replace(
            opt_state=scheduler.step(val["loss"], state.opt_state)
        )

        metadata = {
            "epoch": epoch,
            "phase": phase,
            "train_loss": train_loss,
            "train_accuracy": train_acc,
            "val_loss": val["loss"],
            "val_accuracy": val["accuracy"],
            "best_val_loss": min(best["loss"], val["loss"]),
            "best_val_accuracy": max(best["accuracy"], val["accuracy"]),
            "video_frames": cfg.video_frames,
            "audio_frames": cfg.audio_frames,
            "crop_size": cfg.crop_size,
        }
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ckpt_lib.save_checkpoint(out / "latest", variables, metadata)
        if val["loss"] < best["loss"]:
            best["loss"] = val["loss"]
            ckpt_lib.save_checkpoint(
                out / "best_model_loss", variables, metadata
            )
        if val["accuracy"] > best["accuracy"]:
            best["accuracy"] = val["accuracy"]
            epochs_without_improvement = 0
            ckpt_lib.save_checkpoint(
                out / "best_model_accuracy", variables, metadata
            )
        else:
            epochs_without_improvement += 1
        history = {"train_loss": train_loss, "val_loss": val["loss"],
                   "val_accuracy": val["accuracy"], "epoch": epoch}

        if (
            args.early_stopping_patience is not None
            and epochs_without_improvement >= args.early_stopping_patience
        ):
            logger.info("Early stopping at epoch %d (no accuracy "
                        "improvement for %d epochs)", epoch,
                        epochs_without_improvement)
            break

    return history


def main() -> None:
    args = build_argparser().parse_args()
    run_training(args)


if __name__ == "__main__":
    main()

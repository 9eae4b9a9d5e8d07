"""Transfer-learning CLI: ``python -m lipsync_tpu.training.finetune``.

Re-design of `/root/reference/app/training/finetune.py:469-926`: partial
checkpoint load skipping shape mismatches, 2 phases (frozen encoders for
``--frozen-epochs`` then full unfreeze), AdamW param groups (head 1e-4,
encoders 5e-5, wd 1e-4), gradient clipping 1.0, per-epoch confusion
matrices written to text files, F1 threshold sweep 0.05-0.95 and
best-F1/best-loss/best-accuracy/best_frozen checkpoints with the tuned
threshold embedded in metadata.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lipsync_tpu.models import (
    LipSyncModel,
    ModelConfig,
    load_torch_checkpoint,
)
from lipsync_tpu.ops.augment import AugmentConfig
from lipsync_tpu.parallel import mesh as mesh_lib
from lipsync_tpu.training import checkpoints as ckpt_lib
from lipsync_tpu.training.data import (
    Augmentations,
    BatchLoader,
    LipSyncDataset,
)
from lipsync_tpu.training.optimizers import make_phase_optimizer
from lipsync_tpu.training.steps import (
    LossConfig,
    create_train_state,
    make_train_step,
)
from lipsync_tpu.training.train import make_eval_fn, validate
from lipsync_tpu.utils.logger import get_logger
from lipsync_tpu.utils.metrics import find_best_threshold

logger = get_logger(__name__)


def collect_val_probs(eval_fn, state, loader) -> Dict[str, np.ndarray]:
    probs, labels = [], []
    for batch in loader:
        logits = np.asarray(
            eval_fn(state.params, state.batch_stats,
                    jnp.asarray(batch["visual"]), jnp.asarray(batch["audio"]))
        )
        probs.append(1 / (1 + np.exp(-logits)))
        labels.append(batch["label"])
    if not probs:
        return {"prob_real": np.zeros(0), "label": np.zeros(0)}
    return {
        "prob_real": np.concatenate(probs),
        "label": np.concatenate(labels),
    }


def write_confusion_matrix(path: Path, probs: np.ndarray, labels: np.ndarray,
                           threshold: float, epoch: int) -> None:
    """Per-epoch confusion matrix text file (finetune.py:441-466)."""
    pred_fake = (1 - probs) >= threshold
    true_fake = labels < 0.5
    tp = int(np.sum(pred_fake & true_fake))
    fp = int(np.sum(pred_fake & ~true_fake))
    fn = int(np.sum(~pred_fake & true_fake))
    tn = int(np.sum(~pred_fake & ~true_fake))
    path.write_text(
        f"Epoch {epoch} confusion matrix (threshold={threshold:.2f})\n"
        f"                 pred_fake  pred_real\n"
        f"true_fake        {tp:9d}  {fn:9d}\n"
        f"true_real        {fp:9d}  {tn:9d}\n"
    )


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Finetune the lip-sync model")
    p.add_argument("--data-dir", type=Path, default=None)
    p.add_argument("--preprocessed-dir", type=Path, default=None)
    p.add_argument("--checkpoint", type=Path, required=True,
                   help="Base checkpoint (orbax dir or torch .pth)")
    p.add_argument("--output-dir", type=Path, default=Path("weights_finetune"))
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--frozen-epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr-head", type=float, default=1e-4)
    p.add_argument("--lr-encoder", type=float, default=5e-5)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--val-split", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--video-frames", type=int, default=32)
    p.add_argument("--audio-frames", type=int, default=128)
    p.add_argument("--crop-size", type=int, default=96)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--device-augment", action="store_true",
                   help="Augment on device inside the jitted step "
                        "(lipsync_tpu.ops.augment) instead of the host "
                        "loader thread")
    p.add_argument("--no-face-detection", action="store_true")
    p.add_argument("--device-cache", action="store_true",
                   help="Upload the whole preprocessed full_sequence "
                        "corpus to device memory once and gather finetune "
                        "windows ON DEVICE (training/device_cache.py); the "
                        "host ships only per-batch int32 index arrays. "
                        "Implies --device-augment; needs --preprocessed-dir "
                        "and a corpus that fits in HBM (~10 GB cap)")
    p.add_argument("--max-steps-per-epoch", type=int, default=None)
    return p


def run_finetune(args, detector_backend=None) -> Dict[str, float]:
    from lipsync_tpu.utils.device import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    cfg = ModelConfig(
        video_frames=args.video_frames,
        crop_size=args.crop_size,
        audio_frames=args.audio_frames,
    )
    model = LipSyncModel(cfg)
    # Same data-parallel surface as train.py:139,239-242 (reference
    # finetune.py is single-device; SURVEY §2.4 makes DP a first-class
    # axis of the rebuild): batches pad to a device multiple and shard
    # over the 1-D data mesh; XLA inserts the gradient all-reduce.
    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh() if n_dev > 1 else None
    logger.info("Finetuning on %d device(s)", n_dev)

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
        uint8_visual=device_augment,
    )
    n = len(dataset)
    rng = np.random.RandomState(args.seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * args.val_split)) if n > 1 else 0
    val_idx, train_idx = perm[:n_val].tolist(), perm[n_val:].tolist()

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

    def val_batches():
        """Fresh eval-mode iterator (validate + collect_val_probs each
        consume one; cache.batches generators are one-shot)."""
        if cache is not None:
            return cache.batches(val_idx, args.batch_size, train_mode=False)
        return val_loader

    def build(phase: int, params=None, batch_stats=None):
        optimizer = make_phase_optimizer(
            phase, args.lr_head, args.lr_encoder, kind="adamw",
            weight_decay=args.weight_decay, grad_clip=args.grad_clip,
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
        return optimizer, state, jax.jit(
            make_train_step(model, optimizer, LossConfig(),
                            augment_cfg=aug_cfg),
            # In-place state update on device (see train.py build()).
            donate_argnums=(0,),
        )

    # Partial checkpoint load (shape mismatches keep fresh init).
    optimizer, state, train_step = build(1)
    ckpt_path = Path(args.checkpoint)
    if ckpt_path.suffix == ".pth":
        ckpt_vars = load_torch_checkpoint(str(ckpt_path))
    else:
        ckpt_vars = ckpt_lib.load_checkpoint(ckpt_path)
    merged, skipped = ckpt_lib.load_checkpoint_partially(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt_vars
    )
    if skipped:
        logger.info("Partial load skipped %d mismatched tensors: %s",
                    len(skipped), skipped[:5])
    state = state.replace(
        params=merged["params"], batch_stats=merged["batch_stats"]
    )

    eval_fn = make_eval_fn(model)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    best = {"loss": float("inf"), "accuracy": -1.0, "f1": -1.0}
    phase = 1
    history = {}

    for epoch in range(args.epochs):
        if epoch == args.frozen_epochs and phase == 1:
            logger.info("Unfreezing encoders at epoch %d", epoch)
            phase = 3
            optimizer, state, train_step = build(
                3, state.params, state.batch_stats
            )

        t0 = time.time()
        losses, steps = [], 0
        if cache is not None:
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
            steps += 1
            if (
                args.max_steps_per_epoch is not None
                and steps >= args.max_steps_per_epoch
            ):
                break
        train_loss = float(np.mean(losses)) if losses else 0.0

        val = validate(eval_fn, state, val_batches()) if val_idx else {
            "loss": train_loss, "accuracy": 0.0,
            "real_accuracy": 0.0, "fake_accuracy": 0.0,
        }
        probs = collect_val_probs(eval_fn, state, val_batches())
        if probs["label"].size:
            fake_probs = 1.0 - probs["prob_real"]
            true_fake = probs["label"] < 0.5
            best_t, best_t_metrics = find_best_threshold(
                fake_probs, true_fake,
                thresholds=np.arange(0.05, 0.951, 0.05),
            )
            f1 = best_t_metrics["f1"]
            write_confusion_matrix(
                out / f"confusion_epoch_{epoch:03d}.txt",
                probs["prob_real"], probs["label"], 0.5, epoch,
            )
        else:
            best_t, f1 = 0.5, 0.0

        logger.info(
            "Epoch %d (phase %d): train_loss=%.4f val_loss=%.4f "
            "val_acc=%.2f%% best_f1=%.4f@t=%.2f %.1fs",
            epoch, phase, train_loss, val["loss"], val["accuracy"] * 100,
            f1, best_t, time.time() - t0,
        )

        metadata = {
            "epoch": epoch, "phase": phase, "train_loss": train_loss,
            "val_loss": val["loss"], "val_accuracy": val["accuracy"],
            "best_f1": f1, "f1_threshold": best_t,
            "video_frames": cfg.video_frames,
            "audio_frames": cfg.audio_frames,
        }
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ckpt_lib.save_checkpoint(out / "latest", variables, metadata)
        if phase == 1 and val["loss"] < best["loss"]:
            ckpt_lib.save_checkpoint(
                out / "best_frozen_loss", variables, metadata
            )
        if val["loss"] < best["loss"]:
            best["loss"] = val["loss"]
            ckpt_lib.save_checkpoint(
                out / "best_model_loss", variables, metadata
            )
        if val["accuracy"] > best["accuracy"]:
            best["accuracy"] = val["accuracy"]
            ckpt_lib.save_checkpoint(
                out / "best_model_accuracy", variables, metadata
            )
        if f1 > best["f1"]:
            best["f1"] = f1
            ckpt_lib.save_checkpoint(out / "best_model_f1", variables, metadata)
        history = {"epoch": epoch, "val_loss": val["loss"],
                   "val_accuracy": val["accuracy"], "best_f1": f1}

    return history


def main() -> None:
    run_finetune(build_argparser().parse_args())


if __name__ == "__main__":
    main()

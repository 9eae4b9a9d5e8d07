"""Jittable train/eval steps.

Re-creates the objective of the reference's training loop
(`/root/reference/app/training/train.py:115-234`): BCE-with-logits +
``contrastive_weight`` x cross-modal contrastive + ``sync_weight`` x sync
contrastive, where the sync negatives come from a second forward pass on
time-rolled audio (train.py:30-34,169-182; the roll amount is drawn per step
from ±{5,10,15} mel frames).

The whole step — both forwards, all three losses, backward, optimizer,
BatchNorm stat updates — compiles to one XLA program and shards over the
batch axis of a :func:`lipsync_tpu.parallel.mesh.make_mesh` mesh; XLA
inserts the gradient all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lipsync_tpu.models.lip_sync_model import LipSyncModel
from lipsync_tpu.ops.augment import AugmentConfig, augment_batch
from lipsync_tpu.training.losses import (
    bce_with_logits,
    cross_modal_contrastive_loss,
    sync_contrastive_loss,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (train.py:530: contrastive 0.1, sync 0.2)."""

    contrastive_weight: float = 0.1
    sync_weight: float = 0.2
    contrastive_temperature: float = 0.07
    contrastive_fake_margin: float = 0.10
    sync_shift_frames: Tuple[int, ...] = (5, 10, 15)


def create_train_state(
    model: LipSyncModel,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    example_batch: Tuple[jnp.ndarray, jnp.ndarray],
) -> TrainState:
    visual, audio = example_batch
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, visual, audio)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        rng=state_rng,
    )


def make_train_step(
    model: LipSyncModel,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig = LossConfig(),
    augment_cfg: AugmentConfig | None = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the fused train step. ``batch`` holds ``visual`` (B,T,H,W,3)
    float [0,1] or uint8 pixels, ``audio`` (B,F,Ta,1), ``label`` (B,) with
    1=REAL.

    With ``augment_cfg``, the batch augments ON DEVICE inside the same
    compiled program (`lipsync_tpu.ops.augment`): the host loader then
    ships raw windows (uint8-transferable) and the one-core host stops
    bounding training throughput."""

    shifts = [s for s in loss_cfg.sync_shift_frames if s != 0]
    shifts = jnp.asarray(shifts + [-s for s in shifts], jnp.int32)

    def loss_fn(params, batch_stats, batch, dropout_rng, shift):
        variables = {"params": params, "batch_stats": batch_stats}
        (logits, aux), mutated = model.apply(
            variables,
            batch["visual"],
            batch["audio"],
            train=True,
            return_aux=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        labels = batch["label"].astype(jnp.float32)
        # Optional (B,) 0/1 mask excluding pad rows: ragged final batches
        # are padded to a device multiple so every step runs sharded
        # (key presence is static per compiled program).
        sample_mask = batch.get("sample_mask")
        bce = bce_with_logits(logits, labels, sample_mask=sample_mask)
        cm = cross_modal_contrastive_loss(
            aux["visual_tokens"],
            aux["audio_tokens"],
            labels,
            temperature=loss_cfg.contrastive_temperature,
            fake_margin=loss_cfg.contrastive_fake_margin,
            sample_mask=sample_mask,
        )
        loss = bce + loss_cfg.contrastive_weight * cm

        sync = jnp.zeros(())
        if loss_cfg.sync_weight > 0 and len(loss_cfg.sync_shift_frames) > 0:
            audio_shifted = jnp.roll(batch["audio"], shift, axis=2)
            (_, aux_neg), _ = model.apply(
                variables,
                batch["visual"],
                audio_shifted,
                train=True,
                return_aux=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            real_mask = labels >= 0.5
            if sample_mask is not None:
                real_mask = jnp.logical_and(real_mask, sample_mask > 0)
            sync = sync_contrastive_loss(
                aux["visual_tokens"],
                aux["audio_tokens"],
                [aux_neg["audio_tokens"]],
                real_mask=real_mask,
                temperature=loss_cfg.contrastive_temperature,
            )
            loss = loss + loss_cfg.sync_weight * sync

        preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        correct = (preds == labels).astype(jnp.float32)
        if sample_mask is None:
            acc = jnp.mean(correct)
        else:
            m = sample_mask.astype(jnp.float32)
            acc = jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)
        metrics = {"loss": loss, "bce": bce, "contrastive": cm, "sync": sync,
                   "accuracy": acc}
        return loss, (mutated["batch_stats"], metrics)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, dropout_rng, shift_rng, aug_rng = jax.random.split(state.rng, 4)
        visual = batch["visual"]
        if visual.dtype == jnp.uint8:
            visual = visual.astype(jnp.float32) / 255.0
        if augment_cfg is not None and augment_cfg.enabled:
            visual, audio = augment_batch(
                aug_rng, visual, batch["audio"], augment_cfg
            )
            batch = dict(batch, visual=visual, audio=audio)
        else:
            batch = dict(batch, visual=visual)
        shift = shifts[jax.random.randint(shift_rng, (), 0, shifts.shape[0])]
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, dropout_rng, shift
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model: LipSyncModel):
    """Forward-only step returning logits (eval-mode BN, no dropout)."""

    def eval_step(params, batch_stats, visual, audio):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, visual, audio
        )

    return eval_step

"""Phased-freezing optimizers + host-side LR scheduling.

The reference trains in freeze phases (train.py:57-112: phase 1 head-only,
phase 2 +audio encoder, phase 3 full model with a lower encoder LR) by
rebuilding the torch optimizer per phase. Here each phase is an
``optax.multi_transform`` over param-tree labels (frozen groups get
``set_to_zero``), and ``ReduceLROnPlateau`` mutates the injected
learning-rate hyperparams in the optimizer state — no recompilation.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import optax


def label_params(params) -> Dict:
    """Label top-level modules: visual / audio / head."""
    def label_of(module_name: str) -> str:
        if module_name == "visual_encoder":
            return "visual"
        if module_name == "audio_encoder":
            return "audio"
        return "head"

    return {
        name: jax.tree_util.tree_map(lambda _: label_of(name), sub)
        for name, sub in params.items()
    }


def make_phase_optimizer(
    phase: int,
    lr_head: float,
    lr_encoder: float,
    kind: str = "adam",
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Phase 1: head only; phase 2: +audio; phase 3: full model."""

    def base(lr):
        if kind == "adamw":
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, weight_decay=weight_decay
            )
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)

    transforms = {
        "head": base(lr_head),
        "audio": base(lr_encoder) if phase >= 2 else optax.set_to_zero(),
        "visual": base(lr_encoder) if phase >= 3 else optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, label_params)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def map_learning_rates(opt_state, fn: Callable):
    """Apply ``fn`` to every injected learning_rate in an optimizer state
    (recurses through chain/multi_transform/masked wrappers)."""
    if hasattr(opt_state, "hyperparams") and hasattr(opt_state, "_replace"):
        hp = dict(opt_state.hyperparams)
        if "learning_rate" in hp:
            hp["learning_rate"] = fn(hp["learning_rate"])
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple) and hasattr(opt_state, "_fields"):
        return type(opt_state)(*[map_learning_rates(v, fn) for v in opt_state])
    if isinstance(opt_state, (tuple, list)):
        return type(opt_state)(map_learning_rates(v, fn) for v in opt_state)
    if isinstance(opt_state, dict):
        return {k: map_learning_rates(v, fn) for k, v in opt_state.items()}
    return opt_state


def current_learning_rate(opt_state) -> Optional[float]:
    """First injected learning rate found (for logging)."""
    found = []

    def probe(lr):
        found.append(float(lr))
        return lr

    map_learning_rates(opt_state, probe)
    return found[0] if found else None


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau(mode=min, factor=0.5, patience=5) analog
    (train.py:541-543), acting on the optax state."""

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 min_lr: float = 1e-7):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float, opt_state):
        """Returns (possibly updated) opt_state."""
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad_epochs = 0
            return opt_state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return map_learning_rates(
                opt_state, lambda lr: (lr * self.factor).clip(self.min_lr)
            )
        return opt_state

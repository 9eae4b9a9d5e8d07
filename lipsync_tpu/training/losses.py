"""Training losses: BCE + two contrastive objectives.

Functional port of `/root/reference/app/training/losses.py:10-104`, rewritten
with static-shape masking (no boolean indexing) so each loss jits cleanly and
shards over the batch axis. Masked means reproduce the reference's
"skip-if-empty" semantics exactly: when a class is absent the corresponding
term contributes nothing and the term-count denominator shrinks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    sample_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss).

    ``sample_mask`` (B,) excludes padded rows (ragged final batches are
    padded to a device multiple for sharded training) from the mean.
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per_sample = -(labels * log_p + (1.0 - labels) * log_not_p)
    if sample_mask is None:
        return jnp.mean(per_sample)
    m = sample_mask.astype(jnp.float32)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def _pooled_normalize(tokens: jnp.ndarray) -> jnp.ndarray:
    """Mean over time then L2-normalize (losses.py:40-41). Matches
    ``F.normalize`` eps semantics (clamp norm at 1e-12).

    Gradient-safe at zero: ``sqrt(max(sum(x^2), eps))`` keeps the backward
    finite for an all-zero vector (d||x||/dx at 0 is NaN through a bare
    norm; torch defines it as 0, and 0-vectors do occur — e.g. padded
    rows or degenerate activations)."""
    pooled = jnp.mean(tokens, axis=1)
    sq = jnp.sum(pooled * pooled, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    return pooled / norm


def sync_contrastive_loss(
    visual_tokens: jnp.ndarray,
    audio_tokens: jnp.ndarray,
    audio_tokens_negatives: Sequence[jnp.ndarray],
    real_mask: jnp.ndarray | None = None,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """InfoNCE of (video, aligned audio) vs time-shifted negatives, averaged
    over REAL samples only (losses.py:10-52)."""
    if len(audio_tokens_negatives) == 0:
        return jnp.zeros(())
    b = visual_tokens.shape[0]
    if real_mask is None:
        real_mask = jnp.ones((b,), dtype=bool)
    real_f = real_mask.astype(jnp.float32)

    inv_t = 1.0 / max(temperature, 1e-6)
    v = _pooled_normalize(visual_tokens)
    a = _pooled_normalize(audio_tokens)
    pos = jnp.sum(v * a, axis=-1) * inv_t  # (B,)
    negs = jnp.stack(
        [jnp.sum(v * _pooled_normalize(an), axis=-1) * inv_t
         for an in audio_tokens_negatives],
        axis=1,
    )  # (B, N)
    logits = jnp.concatenate([pos[:, None], negs], axis=1)
    per_sample = jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
    n_real = jnp.sum(real_f)
    loss = jnp.sum(per_sample * real_f) / jnp.maximum(n_real, 1.0)
    return jnp.where(n_real > 0, loss, 0.0)


def cross_modal_contrastive_loss(
    visual_tokens: jnp.ndarray,
    audio_tokens: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.07,
    fake_margin: float = 0.10,
    sample_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batch InfoNCE on real pairs + margin push-down of the diagonal vs the
    hardest negative for fake pairs (losses.py:55-104).

    ``sample_mask`` (B,) excludes padded rows entirely: they contribute no
    loss terms AND never appear as negatives for valid rows, so a padded
    batch reproduces the unpadded loss exactly.
    """
    labels = labels.reshape(-1)
    v = _pooled_normalize(visual_tokens)
    a = _pooled_normalize(audio_tokens)
    sim = (v @ a.T) / max(temperature, 1e-6)  # (B, B)
    b = sim.shape[0]
    diag = jnp.diagonal(sim)

    # Finite sentinel (|sim| <= 1/temperature << 1e9) so a fully-masked
    # row's max stays finite and downstream 0-weights kill it cleanly.
    NEG = -1e9
    if sample_mask is None:
        valid = jnp.ones((b,), jnp.float32)
    else:
        valid = sample_mask.reshape(-1).astype(jnp.float32)
    real_f = (labels >= 0.5).astype(jnp.float32) * valid
    fake_f = (1.0 - (labels >= 0.5).astype(jnp.float32)) * valid
    n_real = jnp.sum(real_f)
    n_fake = jnp.sum(fake_f)
    n_valid = jnp.sum(valid)

    # Padded rows/columns are removed from the negative pools.
    sim_cols = jnp.where(valid[None, :] > 0, sim, NEG)
    sim_rows = jnp.where(valid[:, None] > 0, sim, NEG)

    # Row/column InfoNCE over the valid batch of classes, averaged on real rows.
    row_ce = jax.nn.logsumexp(sim_cols, axis=1) - diag
    col_ce = jax.nn.logsumexp(sim_rows, axis=0) - diag
    real_row = jnp.sum(row_ce * real_f) / jnp.maximum(n_real, 1.0)
    real_col = jnp.sum(col_ce * real_f) / jnp.maximum(n_real, 1.0)

    # Fake margin term (only defined for >1 valid sample).
    eye = jnp.eye(b, dtype=bool)
    hardest_row = jnp.max(jnp.where(eye, NEG, sim_cols), axis=1)
    hardest_col = jnp.max(jnp.where(eye, NEG, sim_rows), axis=0)
    row_loss = jnp.sum(
        jax.nn.relu(diag - hardest_row + fake_margin) * fake_f
    ) / jnp.maximum(n_fake, 1.0)
    col_loss = jnp.sum(
        jax.nn.relu(diag - hardest_col + fake_margin) * fake_f
    ) / jnp.maximum(n_fake, 1.0)
    fake_term = 0.5 * (row_loss + col_loss)

    has_real = (n_real > 0).astype(jnp.float32)
    has_fake = jnp.logical_and(n_fake > 0, n_valid > 1).astype(jnp.float32)
    total = has_real * (real_row + real_col) + has_fake * fake_term
    n_terms = 2.0 * has_real + has_fake
    return jnp.where(n_terms > 0, total / jnp.maximum(n_terms, 1.0), 0.0)

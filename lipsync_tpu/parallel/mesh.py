"""Device mesh + sharding helpers.

The reference is single-device only (SURVEY.md §2.4: no torch.distributed,
no collectives anywhere). Parallelism here is therefore new, TPU-first
design surface: the model is small (~tens of MB) so parameters are
replicated and the *batch axis* — windows x face-tracks x requests — is
sharded over a 1-D ``data`` mesh that rides ICI within a slice. Scaling out
to multi-slice DP over DCN is a mesh-shape change, not a code change.

XLA inserts the (grad-)psum collectives from the sharding annotations; no
hand-written communication is needed at this model scale.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the batch of windows/tracks/requests) over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every leaf of ``batch`` with axis-0 sharded on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_batch_to_multiple(batch: dict, n_dev: int) -> dict:
    """Pad every array's axis 0 up to a multiple of ``n_dev`` (repeating the
    last row) and attach a 0/1 ``sample_mask`` marking real rows.

    Fixes the ragged-final-batch hazard: an un-padded remainder batch can't
    shard evenly over the mesh, which would commit it to one device and
    compile a second (unsharded) program. The mask is threaded into the
    losses/metrics so padded rows contribute nothing to the loss/metric
    sums (train step: ``lipsync_tpu.training.steps``). Always adds the
    mask — even when no padding is needed — so full batches reuse one
    compiled program family.

    Caveat: BatchNorm batch statistics still see the padded (repeated-row)
    samples in train mode, so real rows' activations on a padded step are
    not bit-identical to an unpadded step — a small, bounded perturbation
    (duplicates of an in-batch row), the standard trade for static shapes.
    """
    b = int(next(iter(batch.values())).shape[0])
    target = pad_to_multiple(b, n_dev)
    mask = np.zeros((target,), np.float32)
    mask[:b] = 1.0
    if target != b:
        batch = {
            k: np.concatenate(
                [v, np.repeat(v[-1:], target - b, axis=0)], axis=0
            )
            for k, v in batch.items()
        }
    else:
        batch = dict(batch)
    batch["sample_mask"] = mask
    return batch

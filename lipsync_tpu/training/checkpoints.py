"""Orbax checkpointing with reference-compatible selection policy.

Mirrors the reference checkpoint contract (train.py:664-696: latest /
best_model_loss / best_model_accuracy with input-geometry metadata;
finetune.py:717-771 adds best_frozen_* and best_model_f1 with the tuned
threshold embedded) on top of orbax directories + a JSON metadata sidecar.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: Path,
    variables: Dict[str, Any],
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save {params, batch_stats} via orbax + metadata.json sidecar."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_numpy_tree(variables))
    ckptr.wait_until_finished()
    if metadata is not None:
        (path / "metadata.json").write_text(json.dumps(metadata, indent=2))


def load_checkpoint(
    path: Path, template: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        restored = ckptr.restore(path, _to_numpy_tree(template))
    else:
        restored = ckptr.restore(path)
    return restored


def load_metadata(path: Path) -> Dict[str, Any]:
    meta = Path(path) / "metadata.json"
    return json.loads(meta.read_text()) if meta.exists() else {}


def load_checkpoint_partially(variables, ckpt_variables):
    """Transfer-learning load skipping shape mismatches
    (finetune.py:174-213): leaves whose shapes differ keep their fresh
    initialization; returns (merged, skipped_paths)."""
    skipped = []

    def merge(path, new, old):
        if old is None:
            return new
        new_arr, old_arr = np.asarray(new), np.asarray(old)
        if new_arr.shape != old_arr.shape:
            skipped.append("/".join(str(p) for p in path))
            return new
        return old

    def walk(path, new_tree, old_tree):
        if isinstance(new_tree, dict):
            return {
                k: walk(path + (k,), v, (old_tree or {}).get(k))
                for k, v in new_tree.items()
            }
        return merge(path, new_tree, old_tree)

    merged = walk((), variables, ckpt_variables)
    return merged, skipped

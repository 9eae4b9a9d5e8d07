#!/usr/bin/env python3
"""Strict-venv finetune runner.

TPU-native analog of the reference's venv-enforcing launcher
(reference scripts/run_finetune_strict_venv.py:1-97): it refuses to run
outside the repo-local ``./venv`` interpreter (re-exec'ing itself into it
when invoked from another Python), validates the pinned data/checkpoint
paths, then runs ONE fixed finetune configuration — the reproducible
"blessed" finetune recipe, as opposed to the env-overridable
``run_finetune.sh`` wrapper.

Pinned configuration mapping (reference :57-81 -> lipsync_tpu CLI):
  --epochs 36 --freeze-epochs 8 --batch-size 8    -> same (``--frozen-epochs``)
  --lr 2e-4 --lr-encoder 2e-5                     -> ``--lr-head 2e-4 --lr-encoder 2e-5``
  --contrastive-weight 0.1                        -> LossConfig default (steps.py:47)
  --use-augmentation                              -> augmentation is default-on
                                                     (``--no-augment`` absent)
  --early-stopping-patience 8 / --log-every 5     -> finetune logs every epoch and
                                                     keeps best-F1/best-acc
                                                     checkpoints instead of
                                                     stopping early (finetune.py)
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

INTERNAL_FLAG = "--__inside-venv"


def main() -> int:
    script_path = Path(__file__).resolve()
    repo_root = script_path.parent.parent
    venv_python = repo_root / "venv" / "bin" / "python"

    if not venv_python.is_file():
        print("ERROR: venv Python not found.")
        print(f"Expected: {venv_python}")
        print("Create it first (jax/flax/optax/orbax must be importable; on a")
        print("machine with the stack preinstalled, --system-site-packages")
        print("inherits it without any pip install):")
        print(f"  cd {repo_root}")
        print("  python3 -m venv --system-site-packages venv")
        return 1

    # Re-launch under the venv interpreter if we aren't already in it.
    if INTERNAL_FLAG not in sys.argv:
        current_python = Path(sys.executable).resolve()
        if current_python != venv_python.resolve():
            os.execv(
                str(venv_python),
                [str(venv_python), str(script_path), INTERNAL_FLAG],
            )

    data_dir = repo_root / "data" / "AVLips12"
    pretrained = repo_root / "weights" / "best_model_accuracy"

    if not data_dir.is_dir():
        print(f"ERROR: data directory not found: {data_dir}")
        return 1
    if not pretrained.exists():
        print(f"ERROR: pretrained checkpoint not found: {pretrained}")
        return 1

    os.chdir(repo_root)

    cmd = [
        str(venv_python),
        "-m",
        "lipsync_tpu.training.finetune",
        "--data-dir",
        "data/AVLips12",
        "--checkpoint",
        "weights/best_model_accuracy",
        "--epochs",
        "36",
        "--frozen-epochs",
        "8",
        "--batch-size",
        "8",
        "--lr-head",
        "2e-4",
        "--lr-encoder",
        "2e-5",
    ]

    print("=" * 70)
    print("Running strict-venv finetune command")
    print(f"Repo root: {repo_root}")
    print(f"Python: {venv_python}")
    print("Command:")
    print(" ".join(cmd))
    print("=" * 70)

    result = subprocess.run(cmd, env=os.environ.copy())
    return result.returncode


if __name__ == "__main__":
    raise SystemExit(main())

"""Strict-venv finetune launcher (scripts/run_finetune_strict_venv.py).

Ports the reference's venv-enforcing launcher behavior (reference
scripts/run_finetune_strict_venv.py:1-97): refuse without ./venv,
re-exec into the venv interpreter, validate pinned paths, run one
fixed finetune command. Tested against a scratch repo tree with a
shell-stub "venv python" that records the finetune invocation.
"""

import shutil
import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "run_finetune_strict_venv.py"


def _make_repo(tmp_path: Path) -> Path:
    repo = tmp_path / "repo"
    (repo / "scripts").mkdir(parents=True)
    shutil.copy(SCRIPT, repo / "scripts" / "run_finetune_strict_venv.py")
    return repo


def _run(repo: Path):
    return subprocess.run(
        [sys.executable, str(repo / "scripts" / "run_finetune_strict_venv.py")],
        capture_output=True, text=True, timeout=120,
    )


def test_refuses_without_venv(tmp_path):
    repo = _make_repo(tmp_path)
    proc = _run(repo)
    assert proc.returncode == 1
    assert "venv Python not found" in proc.stdout


def _install_stub_venv(repo: Path) -> Path:
    """A 'venv python' that intercepts `-m` module runs (logging the full
    argv instead of executing) and delegates everything else to the real
    interpreter, so the launcher itself still runs after its re-exec."""
    bin_dir = repo / "venv" / "bin"
    bin_dir.mkdir(parents=True)
    stub = bin_dir / "python"
    log = repo / "cmd.log"
    stub.write_text(
        "#!/bin/sh\n"
        f'if [ "$1" = "-m" ]; then echo "$@" > "{log}"; exit 0; fi\n'
        f'exec "{sys.executable}" "$@"\n'
    )
    stub.chmod(0o755)
    return log


def test_refuses_without_data_dir(tmp_path):
    repo = _make_repo(tmp_path)
    _install_stub_venv(repo)
    proc = _run(repo)
    assert proc.returncode == 1
    assert "data directory not found" in proc.stdout


def test_reexecs_and_runs_pinned_finetune(tmp_path):
    repo = _make_repo(tmp_path)
    log = _install_stub_venv(repo)
    (repo / "data" / "AVLips12").mkdir(parents=True)
    (repo / "weights").mkdir()
    (repo / "weights" / "best_model_accuracy").write_text("ckpt")
    proc = _run(repo)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    cmd = log.read_text()
    assert "lipsync_tpu.training.finetune" in cmd
    # Pinned recipe (reference run_finetune_strict_venv.py:57-81).
    for frag in ("--epochs 36", "--frozen-epochs 8", "--batch-size 8",
                 "--lr-head 2e-4", "--lr-encoder 2e-5",
                 "--data-dir data/AVLips12",
                 "--checkpoint weights/best_model_accuracy"):
        assert frag in cmd, f"missing {frag!r} in: {cmd}"

"""Cross-tier transfer matrix: score one model on several test tiers.

The synthetic benchmark has two articulation tiers (envelope, phoneme —
scripts/make_synthetic_dataset.py) whose fake constructions differ; a
model trained on one tier transfers weakly to the other
(docs/eval/cross_tier_transfer.json). This harness scores a single
model on N preprocessed test dirs through the production evaluation
path (scripts/validate_pipeline.py, same scoring the reference's
validate_pipeline.py:214-320 performs) and emits one JSON matrix row
per tier, so union-trained models can be compared against the
single-tier baselines.

Usage:
    python scripts/eval_cross_tier.py \
        --model-path /tmp/union_weights/best_model_accuracy \
        --test-dir hardened=/tmp/synth_r3_5k/pre_test \
        --test-dir phoneme=/tmp/synth_r3_ph/pre_test \
        --calibration-platt-a 0.79 --calibration-platt-b 0.29 \
        --output docs/eval/cross_tier_union.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def score_tier(model_path: str, pre_dir: str, out_dir: Path,
               platt_a: float | None, platt_b: float | None,
               limit: int | None, batch_size: int, engine=None) -> dict:
    """Score one preprocessed dir. Default: a validate_pipeline
    subprocess (isolation). With ``engine``: run in-process reusing the
    already-loaded engine — each fresh process costs minutes of jax init
    + checkpoint restore through the dev tunnel, which dominates matrix
    evals (9+ invocations); measured r5 when the tunnel degraded to
    ~2-3x its morning latency."""
    if engine is not None:
        sys.path.insert(0, str(REPO))
        sys.path.insert(0, str(REPO / "scripts"))
        import validate_pipeline as vp
        from lipsync_tpu.inference.calibration import Calibrator

        if platt_a is not None:
            engine.calibrator = Calibrator.from_config(
                method="platt", platt_a=platt_a, platt_b=platt_b)
        else:
            engine.calibrator = Calibrator.from_config(method="none")
        ns = argparse.Namespace(
            preprocessed_dir=Path(pre_dir), output_dir=Path(out_dir),
            batch_size=batch_size, limit=limit, threshold=0.5)
        m = vp.run_preprocessed_mode(ns, engine=engine)
        return {k: m[k] for k in
                ("roc_auc", "accuracy", "f1", "precision", "recall",
                 "total") if k in m}
    cmd = [sys.executable, "scripts/validate_pipeline.py",
           "--preprocessed-dir", pre_dir, "--model-path", model_path,
           "--output-dir", str(out_dir), "--batch-size", str(batch_size)]
    if platt_a is not None:
        cmd += ["--calibration-method", "platt",
                "--calibration-platt-a", str(platt_a),
                "--calibration-platt-b", str(platt_b)]
    if limit:
        cmd += ["--limit", str(limit)]
    proc = subprocess.run(cmd, cwd=REPO, text=True,
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT)
    if proc.returncode != 0:
        print(proc.stdout[-3000:], flush=True)
        raise SystemExit(f"validate_pipeline failed on {pre_dir}")
    m = json.loads((out_dir / "metrics.json").read_text())
    return {k: m[k] for k in
            ("roc_auc", "accuracy", "f1", "precision", "recall", "total")
            if k in m}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model-path", required=True)
    p.add_argument("--model-name", default=None,
                   help="row label in the output (default: model dir name)")
    p.add_argument("--test-dir", action="append", required=True,
                   metavar="NAME=DIR",
                   help="tier name and preprocessed dir; repeatable")
    p.add_argument("--calibration-platt-a", type=float, default=None)
    p.add_argument("--calibration-platt-b", type=float, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--in-process", action="store_true",
                   help="load the engine once and score all tiers "
                        "in-process (see score_tier)")
    p.add_argument("--output", type=Path, default=None)
    args = p.parse_args(argv)

    name = args.model_name or Path(args.model_path).parent.name
    result: dict = {"model": name, "model_path": args.model_path,
                    "tiers": {}}
    engine = None
    if args.in_process:
        from lipsync_tpu.inference.engine import load_engine

        engine = load_engine(args.model_path)
    for spec in args.test_dir:
        tier, _, pre_dir = spec.partition("=")
        if not pre_dir:
            raise SystemExit(f"--test-dir wants NAME=DIR, got {spec!r}")
        with tempfile.TemporaryDirectory(prefix=f"xtier_{tier}_") as td:
            print(f"[cross_tier] scoring {name} on {tier} ({pre_dir})",
                  flush=True)
            result["tiers"][tier] = score_tier(
                args.model_path, pre_dir, Path(td),
                args.calibration_platt_a, args.calibration_platt_b,
                args.limit, args.batch_size, engine=engine)
            print(f"[cross_tier]   {tier}: "
                  f"{json.dumps(result['tiers'][tier])}", flush=True)

    out = json.dumps(result, indent=2)
    if args.output:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        args.output.write_text(out + "\n")
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

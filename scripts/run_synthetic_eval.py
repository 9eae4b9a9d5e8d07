"""End-to-end synthetic evaluation at scale (round-2 VERDICT item 7).

The environment has zero network egress (DNS resolution fails for all
hosts — see BENCHMARKS.md "Real-data attempt"), so the reference's
real-data accuracy claim (README.md:16,124-127: 98% / F1 0.97 on 50K+
clips) cannot be reproduced here. This script is the documented fallback:
a *hardened* synthetic benchmark through the production pipeline —

  generate (jitter + hard negatives) -> precompute (zarr full_sequence)
  -> train (phased optimizers) -> fit calibrator on held-out split
  -> validate_pipeline on a disjoint test split with calibrated
     thresholding -> metrics.json

"Hardened" vs the round-1 demo: faces are randomized per clip in
position/scale/skin/lip color/noise (the classifier cannot use pixel
idiosyncrasies), and half the fakes use the SAME audio envelope
time-shifted 0.25-0.8 s — correlated-but-misaligned lip sync, the
canonical audio-swap manipulation (reference
scripts/generate_audio_swap_fakes.py behavior).

Usage:
    python scripts/run_synthetic_eval.py --work-dir /tmp/synth_r2 \
        [--n-train 300 --n-calib 60 --n-test 100 --epochs 60]

Writes <work-dir>/summary.json and leaves eval artifacts (metrics.json,
ROC/confusion PNGs, high_confidence_errors.csv) in <work-dir>/eval_out.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cmd: list, log: Path, fatal: bool = True) -> str:
    """Run a stage, teeing output to a log file; raise on failure."""
    print(f"[run_synthetic_eval] $ {' '.join(map(str, cmd))}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        [str(c) for c in cmd], cwd=REPO, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    log.parent.mkdir(parents=True, exist_ok=True)
    log.write_text(proc.stdout)
    print(f"[run_synthetic_eval]   -> rc={proc.returncode} "
          f"({time.time() - t0:.0f}s), log: {log}", flush=True)
    if proc.returncode != 0:
        print(proc.stdout[-4000:], flush=True)
        if fatal:
            raise SystemExit(f"stage failed: {cmd[0]} (see {log})")
    return proc.stdout


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--work-dir", type=Path, default=Path("/tmp/synth_r2"))
    p.add_argument("--n-train", type=int, default=300)
    p.add_argument("--n-calib", type=int, default=60)
    p.add_argument("--n-test", type=int, default=100)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--skip-generate", action="store_true")
    p.add_argument("--skip-precompute", action="store_true")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--phase3-start-epoch", type=int, default=None,
                   help="unfreeze everything at this epoch (reference "
                        "default 15 assumes 50K-clip epochs; small synthetic "
                        "runs want 0)")
    p.add_argument("--lr-encoder", type=float, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--device-augment", action="store_true",
                   help="augment on device inside the jitted step (uint8 "
                        "host transfers; removes the 1-core host bottleneck)")
    p.add_argument("--style", choices=("envelope", "phoneme"),
                   default="envelope",
                   help="synthetic articulation style (phoneme = round-3 "
                        "vowel-shaped mouths + formant audio)")
    p.add_argument("--no-hard-negatives", action="store_true",
                   help="fakes all use independent envelopes (middle "
                        "difficulty: cross-clip sync learning without the "
                        "time-shifted same-envelope negatives)")
    p.add_argument("--no-jitter", action="store_true")
    p.add_argument("--device-cache", action="store_true",
                   help="cache the whole corpus in HBM and gather windows "
                        "on device (training/device_cache.py); required for "
                        "multi-hour runs on the axon backend, whose "
                        "host->device transfers leak host RSS "
                        "(BENCHMARKS.md)")
    args = p.parse_args(argv)

    w = args.work_dir
    logs = w / "logs"
    py = sys.executable

    # ── 1. generate three disjoint splits ────────────────────────────────
    if not args.skip_generate:
        for split, n, seed in (("train", args.n_train, 1),
                               ("calib", args.n_calib, 7),
                               ("test", args.n_test, 13)):
            cmd = [py, "scripts/make_synthetic_dataset.py",
                   "--output-dir", w / f"raw_{split}", "--n-per-class", n,
                   "--seconds", args.seconds, "--seed", seed,
                   "--style", args.style]
            if not args.no_jitter:
                cmd.append("--jitter")
            if not args.no_hard_negatives:
                cmd.append("--hard-negatives")
            run(cmd, logs / f"gen_{split}.log")

    # ── 2. precompute (zarr, full_sequence) ──────────────────────────────
    if not args.skip_precompute:
        for split in ("train", "calib", "test"):
            run([py, "scripts/precompute_training_tensors.py",
                 "--data-dir", w / f"raw_{split}",
                 "--output-dir", w / f"pre_{split}",
                 "--mode", "full_sequence", "--storage-format", "zarr"],
                logs / f"pre_{split}.log")
            # Non-fatal: a handful of clips may yield too-short face
            # tracks under jitter; the training loader skips them
            # (collate drops None samples — reference collate.py analog).
            run([py, "scripts/validate_preprocessed.py",
                 "--preprocessed-dir", w / f"pre_{split}"],
                logs / f"valpre_{split}.log", fatal=False)

    # ── 3. train ─────────────────────────────────────────────────────────
    weights = w / "weights"
    if not args.skip_train:
        cmd = [py, "-m", "lipsync_tpu.training.train",
               "--preprocessed-dir", w / "pre_train",
               "--output-dir", weights,
               "--epochs", args.epochs, "--batch-size", args.batch_size,
               "--early-stopping-patience", 15]
        if args.phase3_start_epoch is not None:
            cmd += ["--phase2-start-epoch",
                    min(args.phase3_start_epoch, 5),
                    "--phase3-start-epoch", args.phase3_start_epoch]
        if args.lr_encoder is not None:
            cmd += ["--lr-encoder", args.lr_encoder]
        if args.lr is not None:
            cmd += ["--lr", args.lr]
        if args.device_augment:
            cmd.append("--device-augment")
        if args.device_cache:
            cmd.append("--device-cache")
        run(cmd, logs / "train.log")
    best = weights / "best_model_accuracy"

    # ── 4. calibrate on the held-out calib split ─────────────────────────
    cal_out = run([py, "scripts/fit_calibrator.py",
                   "--preprocessed-dir", w / "pre_calib",
                   "--model-path", best, "--method", "platt"],
                  logs / "calibrate.log")
    pa = float(re.search(r"calibration_platt_a:\s*([-\d.]+)", cal_out)[1])
    pb = float(re.search(r"calibration_platt_b:\s*([-\d.]+)", cal_out)[1])

    # ── 5. evaluate the disjoint test split, calibrated ──────────────────
    run([py, "scripts/validate_pipeline.py",
         "--preprocessed-dir", w / "pre_test", "--model-path", best,
         "--output-dir", w / "eval_out",
         "--calibration-method", "platt",
         "--calibration-platt-a", pa, "--calibration-platt-b", pb],
        logs / "eval.log")

    metrics = json.loads((w / "eval_out" / "metrics.json").read_text())
    summary = {
        "dataset": {
            "train_clips": 2 * args.n_train,
            "calib_clips": 2 * args.n_calib,
            "test_clips": 2 * args.n_test,
            "jitter": not args.no_jitter,
            "hard_negatives": not args.no_hard_negatives,
            "storage": "zarr/full_sequence",
        },
        "calibration": {"method": "platt", "a": pa, "b": pb},
        "test_metrics": metrics,
    }
    (w / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generalization to UNSEEN fake constructions (and per-mode breakdown).

The trained models only ever saw three fake constructions (phoneme tier:
global time-shift, audio-swap, vowel-scramble — make_synthetic_dataset's
training cycle). Real deepfake detectors must generalize to fabrication
methods absent from training, so this harness builds one balanced test
set PER construction — including two held-out-of-training ones:

- ``warp``   — smooth local time-warp (peak 0.15-0.3 s) that drifts in
               and out of sync within the clip (training shifts are
               global and >=0.25 s)
- ``splice`` — partial fake: a real clip whose middle ~third of audio is
               swapped (crossfaded), so 2/3 of windows are genuinely
               synced; exercises the clip-verdict aggregation policy
               (reference app/inference/predictor.py confidence
               weighting, re-designed in lipsync_tpu/inference/policy.py)
- ``freeze`` — partial fake: the visual articulation holds still for
               0.5-1.0 s while audio continues (the classic face-swap
               dropped-frames artifact)
- ``revoice``— video fully real, audio re-synthesized with scrambled
               vowels on the same timing/stress and the ORIGINAL voiced
               envelope (a prosody-preserving re-dub: loudness matches,
               formants mismatch the mouth shapes)
- ``retime`` — video uniformly time-stretched 0.85-0.93x / 1.08-1.18x:
               sync drift grows linearly from 0 to ~0.2-0.5 s
               (fps-mismatch artifact)
- ``composite`` — perfectly synced A/V; the lip region carries face-swap
               blending artifacts only (blur + seam + 1 px shimmer) — no
               sync signal, only the artifact branch can catch it

and scores a single model on each through the full production evaluation
path (validate_pipeline, same scoring the reference's
validate_pipeline.py:214-320 performs), emitting one JSON with per-
construction AUC / recall plus the seen/unseen annotation.

Usage:
    python scripts/eval_unseen_fakes.py \
        --model-path /tmp/union_weights/best_model_accuracy \
        --calibration-platt-a 0.6953 --calibration-platt-b -0.1814 \
        --work-dir /tmp/unseen_eval --n-per-class 150 \
        --output docs/eval/unseen_constructions.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from eval_cross_tier import score_tier  # noqa: E402

SEEN = ("shift", "swap", "scramble")
UNSEEN = ("warp", "splice", "freeze", "revoice", "retime", "composite")


def run(cmd: list, log: Path) -> None:
    import subprocess

    log.parent.mkdir(parents=True, exist_ok=True)
    cmd = [str(c) for c in cmd]
    proc = subprocess.run(cmd, cwd=REPO, text=True,
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT)
    log.write_text(proc.stdout)
    if proc.returncode != 0:
        print(proc.stdout[-3000:], flush=True)
        raise SystemExit(f"step failed: {' '.join(cmd)}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model-path", required=True)
    p.add_argument("--model-name", default=None)
    p.add_argument("--work-dir", type=Path, default=Path("/tmp/unseen_eval"))
    p.add_argument("--n-per-class", type=int, default=150)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--seed-base", type=int, default=101,
                   help="construction k uses seed seed-base+k; keep "
                        "disjoint from training seeds (1/7/13/33)")
    p.add_argument("--constructions", default=",".join(SEEN + UNSEEN))
    p.add_argument("--calibration-platt-a", type=float, default=None)
    p.add_argument("--calibration-platt-b", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--skip-generate", action="store_true")
    p.add_argument("--skip-precompute", action="store_true")
    p.add_argument("--in-process", action="store_true",
                   help="load the engine ONCE and score every "
                        "construction in this process (saves minutes of "
                        "jax init + checkpoint restore per construction "
                        "on the tunneled dev box)")
    p.add_argument("--output", type=Path, default=None)
    args = p.parse_args(argv)

    w = args.work_dir
    logs = w / "logs"
    py = sys.executable
    constructions = [c.strip() for c in args.constructions.split(",")]

    for k, c in enumerate(constructions):
        if not args.skip_generate:
            run([py, "scripts/make_synthetic_dataset.py",
                 "--output-dir", w / f"raw_{c}",
                 "--n-per-class", args.n_per_class,
                 "--seconds", args.seconds, "--seed", args.seed_base + k,
                 "--style", "phoneme", "--jitter", "--fake-modes", c],
                logs / f"gen_{c}.log")
        if not args.skip_precompute:
            run([py, "scripts/precompute_training_tensors.py",
                 "--data-dir", w / f"raw_{c}",
                 "--output-dir", w / f"pre_{c}",
                 "--mode", "full_sequence", "--storage-format", "zarr"],
                logs / f"pre_{c}.log")

    name = args.model_name or Path(args.model_path).parent.name
    result: dict = {"model": name, "model_path": args.model_path,
                    "n_per_class": args.n_per_class,
                    "seen_in_training": list(SEEN),
                    "unseen_constructions": list(UNSEEN),
                    "constructions": {}}
    engine = None
    if args.in_process:
        from lipsync_tpu.inference.engine import load_engine

        engine = load_engine(args.model_path)
    for c in constructions:
        out_dir = w / f"eval_{c}"
        m = score_tier(args.model_path, str(w / f"pre_{c}"), out_dir,
                       args.calibration_platt_a, args.calibration_platt_b,
                       None, args.batch_size, engine=engine)
        m["unseen"] = c in UNSEEN
        result["constructions"][c] = m
        print(f"[{c}{' UNSEEN' if m['unseen'] else ''}] "
              f"auc={m.get('roc_auc')} recall={m.get('recall')}",
              flush=True)

    out = json.dumps(result, indent=2)
    print(out)
    if args.output:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        args.output.write_text(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

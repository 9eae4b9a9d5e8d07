"""Measure speaker/listener articulation-ratio bands on scene families.

VERDICT r4 item 9: the articulation speaking-score constants
(`policy.speaking_articulation_score` — logistic midpoint 0.10, scale
0.03) were calibrated on tracks recovered from ONE synthetic scene
family (speakers 0.12-0.25, listeners 0.056-0.072). This script re-runs
that measurement on arbitrary multiface scene dirs — fresh seeds and the
``--articulation-gain`` variant renderer — so the constants are cited to
a multi-family measurement and their separation margin is on record.

Tracks are recovered through the PRODUCTION host path
(`preprocessing.video.detect_and_crop_tracks` — Haar ladder + streaming
tracker), matched to ground-truth faces by the sidecar's cell geometry,
and the PRE-logistic ratio (`policy.articulation_ratio`) is pooled by
role. Reference context: the reference has no articulation signal at all
(its speaking score is the sync correlation, predictor.py:334-370); this
band is the evidence base for the TPU rebuild's opt-in articulation mode.

Usage:
    python scripts/measure_articulation_bands.py \
        --data-dir original=/tmp/mf_scenes_2f \
        --data-dir fresh=/tmp/mf_fresh_2f \
        --data-dir low_gain=/tmp/mf_gain06_2f \
        --out docs/eval/articulation_bands_r5.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

# Host-only measurement: pin the CPU backend BEFORE any lipsync import so
# package-level jax initialization cannot contend for the (possibly busy)
# TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lipsync_tpu.inference.policy import articulation_ratio  # noqa: E402
from lipsync_tpu.preprocessing import ingest  # noqa: E402
from lipsync_tpu.preprocessing.video import (  # noqa: E402
    detect_and_crop_tracks,
)


def measure_family(data_dir: Path, limit: int = None) -> dict:
    clips = sorted(data_dir.glob("*.avi"))
    if limit:
        clips = clips[:limit]
    ratios = {"speaker": [], "listener": []}
    n_clips = 0
    for clip in clips:
        sidecar = clip.with_suffix(".json")
        if not sidecar.exists():
            continue
        truth = json.loads(sidecar.read_text())
        frames = ingest.read_video(clip, truth.get("fps", 15.0))
        tracks = detect_and_crop_tracks(frames)
        n_clips += 1
        cell_w = truth["frame_width"] / truth["n_faces"]
        # Primary (most-hits) track per slot, matched by mean-box center x.
        primary = {}
        for tr in tracks:
            cx = (tr.mean_bbox[0] + tr.mean_bbox[2]) / 2.0
            best_slot, best_d = None, cell_w / 3.0
            for f in truth["faces"]:
                d = abs(cx - float(f["cx"]))
                if d < best_d:
                    best_slot, best_d = int(f["slot"]), d
            if best_slot is None:
                continue
            cur = primary.get(best_slot)
            if cur is None or tr.hits > cur.hits:
                primary[best_slot] = tr
        for f in truth["faces"]:
            tr = primary.get(int(f["slot"]))
            if tr is None:
                continue
            r = articulation_ratio(tr.crops)
            if r is None:
                continue
            role = "listener" if f["role"] == "listener" else "speaker"
            ratios[role].append(r)

    def band(v):
        if not v:
            return None
        a = np.asarray(v)
        return {
            "n": len(v),
            "min": round(float(a.min()), 4),
            "p10": round(float(np.percentile(a, 10)), 4),
            "median": round(float(np.median(a)), 4),
            "p90": round(float(np.percentile(a, 90)), 4),
            "max": round(float(a.max()), 4),
        }

    out = {
        "clips": n_clips,
        "speaker_band": band(ratios["speaker"]),
        "listener_band": band(ratios["listener"]),
    }
    if ratios["speaker"] and ratios["listener"]:
        sp, li = np.asarray(ratios["speaker"]), np.asarray(ratios["listener"])
        out["separation_min_speaker_minus_max_listener"] = round(
            float(sp.min() - li.max()), 4
        )
        # Fraction each side lands on the correct side of the 0.10 midpoint.
        out["speaker_above_midpoint_frac"] = round(
            float((sp > 0.10).mean()), 4
        )
        out["listener_below_midpoint_frac"] = round(
            float((li < 0.10).mean()), 4
        )
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", action="append", required=True,
                   metavar="NAME=DIR")
    p.add_argument("--limit", type=int, default=None,
                   help="max clips per family")
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    result = {"midpoint_constant": 0.10, "scale_constant": 0.03,
              "families": {}}
    for spec in args.data_dir:
        name, _, d = spec.partition("=")
        if not d:
            raise SystemExit(f"--data-dir wants NAME=DIR, got {spec!r}")
        print(f"[bands] measuring {name} ({d}) ...", flush=True)
        result["families"][name] = measure_family(Path(d), args.limit)
        print(f"[bands]   {json.dumps(result['families'][name])}",
              flush=True)

    text = json.dumps(result, indent=1)
    print(text)
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

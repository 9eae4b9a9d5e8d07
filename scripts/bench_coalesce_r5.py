"""Cross-request coalescing A/B (VERDICT r4 item 3, closing r3 item 7).

`serving/config.py` ships ``coalesce_requests=True`` (the CoalescingEngine
merges concurrent requests' windows into shared forwards — the reference
scores strictly batch-1 sequentially, see
/root/reference/app/inference/predictor.py:566-571) but no QPS A/B was
ever recorded. This runs the engine-only matrix
{concurrency 1, 4, 8} x {coalesce off, on} with pre-decoded windows and
ONE loaded engine shared across all cells, writes
``docs/eval/coalesce_r5.json``, and prints a markdown table for
BENCHMARKS.md. The default for ``coalesce_requests`` should then be set
to whatever this measures.

Usage:
    python scripts/bench_coalesce_r5.py [--model-path weights/flagship]
        [--requests 80] [--out docs/eval/coalesce_r5.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from types import SimpleNamespace

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import bench_serving  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", type=Path, default=None,
                   help="defaults to the shipped weights/flagship")
    p.add_argument("--requests", type=int, default=80)
    p.add_argument("--windows-per-request", type=int, default=6)
    p.add_argument("--coalesce-wait-ms", type=float, default=2.0)
    p.add_argument("--concurrencies", default="1,4,8")
    p.add_argument("--out", type=Path,
                   default=REPO / "docs" / "eval" / "coalesce_r5.json")
    args = p.parse_args()

    model_path = args.model_path
    if model_path is None:
        from lipsync_tpu.utils.weights import default_checkpoint

        model_path = default_checkpoint()
        if model_path is None:
            raise SystemExit("no --model-path and no weights/flagship")

    from lipsync_tpu.inference.engine import load_engine

    print(f"[coalesce] loading engine once: {model_path}", file=sys.stderr)
    engine = load_engine(model_path)

    cells = []
    for conc in [int(c) for c in args.concurrencies.split(",")]:
        for mode in ("off", "on"):
            cell_args = SimpleNamespace(
                model_path=model_path,
                requests=args.requests,
                concurrency=conc,
                coalesce=mode,
                coalesce_wait_ms=args.coalesce_wait_ms,
                windows_per_request=args.windows_per_request,
            )
            print(f"[coalesce] concurrency={conc} coalesce={mode}",
                  file=sys.stderr, flush=True)
            cells.append(bench_serving.engine_only_bench(
                cell_args, engine=engine))

    out = {
        "model_path": str(model_path),
        "requests": args.requests,
        "windows_per_request": args.windows_per_request,
        "coalesce_wait_ms": args.coalesce_wait_ms,
        "cells": cells,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(out, indent=2))
    print(f"[coalesce] wrote {args.out}", file=sys.stderr)

    # markdown table for BENCHMARKS.md
    print("| concurrency | coalesce | QPS | windows/s | p50 ms | p95 ms "
          "| batches | coalesced items |")
    print("|---|---|---|---|---|---|---|---|")
    for c in cells:
        print(f"| {c['concurrency']} | {'on' if c['coalesce'] else 'off'} "
              f"| {c['value']} | {c['windows_per_sec']} | {c['p50_ms']} "
              f"| {c['p95_ms']} | {c['batches_dispatched']} "
              f"| {c['items_coalesced']} |")


if __name__ == "__main__":
    main()

"""Merge several preprocessed tensor dirs into one union dataset.

Dataset tooling in the spirit of the reference's precompute/debug scripts
(/root/reference/scripts/precompute_training_tensors.py): training on the
UNION of tiers/domains is the standard fix when per-tier models don't
transfer (see BENCHMARKS.md "Cross-tier zero-shot transfer"), and the
loader takes a single `--preprocessed-dir`.

Records keep their manifests' metadata; keys are prefixed per source
(`d0_`, `d1_`, ... or `--prefixes`) to avoid collisions. Tensor payloads
are SYMLINKED, not copied (zarr per-key subdirs and npy files), so the
union costs no storage; pass `--copy` for a self-contained result.
LMDB/kvlite sources are not supported — convert with
`precompute_training_tensors.py --storage zarr` first.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _limit_balanced(records, limit):
    """First ``limit`` records, alternating labels so the subset stays
    class-balanced regardless of manifest order."""
    if limit is None or len(records) <= limit:
        return records
    by_label: dict = {}
    for r in records:
        by_label.setdefault(r.get("label"), []).append(r)
    pools = list(by_label.values())
    out, i = [], 0
    while len(out) < limit and any(pools):
        pool = pools[i % len(pools)]
        if pool:
            out.append(pool.pop(0))
        i += 1
    return out


def merge(sources, out_dir: Path, prefixes=None, copy: bool = False,
          limit_per_source=None) -> int:
    sources = [Path(s) for s in sources]
    prefixes = prefixes or [f"d{i}" for i in range(len(sources))]
    if len(prefixes) != len(sources):
        raise SystemExit("--prefixes must match the number of sources")
    if limit_per_source and len(limit_per_source) != len(sources):
        raise SystemExit(
            "--limit-per-source must match the number of sources"
        )
    out_dir.mkdir(parents=True, exist_ok=True)

    transfer = shutil.copytree if copy else (
        lambda src, dst: dst.symlink_to(src.resolve())
    )
    transfer_file = shutil.copy2 if copy else (
        lambda src, dst: dst.symlink_to(src.resolve())
    )

    out_records = []
    zarr_out = out_dir / "samples.zarr"
    for si, (src, prefix) in enumerate(zip(sources, prefixes)):
        manifest = src / "manifest.jsonl"
        if not manifest.is_file():
            raise SystemExit(f"No manifest.jsonl in {src}")
        if (src / "samples.lmdb").exists():
            raise SystemExit(
                f"{src} uses LMDB storage — convert to zarr/npy first"
            )
        src_records = [
            json.loads(line)
            for line in manifest.read_text().splitlines() if line.strip()
        ]
        if limit_per_source:
            # HBM budgeting for --device-cache training: the whole union
            # must fit on-device (a 6,800-clip union OOMed v5e-1 at
            # 9.6 GB cache + train-step activations; capping the largest
            # source is the fix — see BENCHMARKS.md grand-union run)
            src_records = _limit_balanced(
                src_records, limit_per_source[si]
            )
        for rec in src_records:
            key = rec["key"]
            new_key = f"{prefix}_{key}"
            rec["key"] = new_key
            if rec.get("storage_format") == "zarr" or (
                "visual_relpath" not in rec
                and (src / "samples.zarr" / key).is_dir()
            ):
                if not zarr_out.exists():
                    zarr_out.mkdir()
                    # Root group metadata (zarr v2) so readers accept the
                    # union store; per-key subgroups keep their own.
                    (zarr_out / ".zgroup").write_text(
                        json.dumps({"zarr_format": 2})
                    )
                dst = zarr_out / new_key
                if not dst.exists():
                    transfer(src / "samples.zarr" / key, dst)
            else:
                for field in ("visual_relpath", "audio_relpath"):
                    rel = rec[field]
                    new_rel = f"{prefix}_{Path(rel).name}"
                    dst = out_dir / new_rel
                    if not dst.exists():
                        transfer_file(src / rel, dst)
                    rec[field] = new_rel
            out_records.append(rec)

    (out_dir / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in out_records) + "\n"
    )
    print(f"Merged {len(out_records)} records from {len(sources)} sources "
          f"into {out_dir}")
    return len(out_records)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sources", nargs="+", type=Path,
                    help="Preprocessed dirs to merge")
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--prefixes", nargs="+", default=None,
                    help="Per-source key prefixes (default d0, d1, ...)")
    ap.add_argument("--copy", action="store_true",
                    help="Copy tensor payloads instead of symlinking")
    ap.add_argument("--limit-per-source", nargs="+", type=int,
                    default=None, metavar="N",
                    help="Cap each source at N records (0 = no cap), "
                         "class-balanced; one value per source. Keeps "
                         "--device-cache unions inside HBM")
    args = ap.parse_args()
    limits = None
    if args.limit_per_source:
        limits = [n if n > 0 else None for n in args.limit_per_source]
    merge(args.sources, args.out, args.prefixes, args.copy, limits)


if __name__ == "__main__":
    main()

"""Offline preprocessing of raw videos into training tensors.

Port of `/root/reference/scripts/precompute_training_tensors.py`:
two modes (``fixed_clip`` = model-ready windows, ``full_sequence`` = full
uint8 crop sequence + full mel for random-window sampling at train time,
:67-119), three storage formats (npy files / zarr group / lmdb npz blobs,
:319-353) + ``manifest.jsonl``, and source-path-based incremental resume
(:359-391). Native layouts; decoding/detection run through the framework's
ingest + tracker stack; zarr needs no wheel (in-repo v2 codec,
``lipsync_tpu.utils.zarrlite``).

Usage:
    python scripts/precompute_training_tensors.py \
        --data-dir data/AVLips --output-dir precomputed --mode full_sequence
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Offline precompute issues many TINY device calls (per-clip crop + mel);
# through a remote-TPU tunnel each costs a dispatch round trip that dwarfs
# the compute. Default to the host CPU backend — must be decided before the
# JAX backend initializes (and via config, not env: a site override can
# rewrite JAX_PLATFORMS — see CLAUDE.md).
if "--platform" in sys.argv:
    _plat = sys.argv[sys.argv.index("--platform") + 1]
else:
    _plat = "cpu"
if _plat != "auto":
    import jax

    jax.config.update("jax_platforms", _plat)

from lipsync_tpu.preprocessing import ingest  # noqa: E402
from lipsync_tpu.preprocessing.audio import preprocess_audio  # noqa: E402
from lipsync_tpu.preprocessing.video import (  # noqa: E402
    detect_and_crop_tracks,
    preprocess_video,
)
from lipsync_tpu.training.data import discover_video_samples  # noqa: E402
from lipsync_tpu.utils.logger import get_logger  # noqa: E402

logger = get_logger("precompute")


def _open_store(out_dir: Path, storage_format: str, map_size_gb: int = 16):
    """Open the tensor store for ``zarr``/``lmdb`` formats (None for npy).

    zarr uses the in-repo dependency-free v2 codec
    (`lipsync_tpu.utils.zarrlite`) — or the real wheel when installed —
    writing the reference layout ``samples.zarr/<key>/{visual,audio}``
    (reference precompute_training_tensors.py:341-353). lmdb (:322-340)
    writes through the real wheel when installed, else through the in-repo
    sqlite-backed `lipsync_tpu.utils.kvlite` (same one-npz-blob-per-key
    contract, no wheel needed; readers auto-detect which wrote the file).
    """
    if storage_format == "npy":
        return None
    if storage_format == "zarr":
        try:
            import zarr  # type: ignore

            path = out_dir / "samples.zarr"
            return zarr.open_group(str(path), mode="a")
        except ImportError:
            from lipsync_tpu.utils import zarrlite

            return zarrlite.open_group(out_dir / "samples.zarr", mode="a")
    if storage_format == "lmdb":
        path = out_dir / "samples.lmdb"
        try:
            import lmdb  # type: ignore

            from lipsync_tpu.utils.kvlite import is_sqlite_file

            if path.exists() and is_sqlite_file(path):
                raise ImportError  # resume a kvlite-written store
            return lmdb.open(
                str(path),
                map_size=int(map_size_gb) * (1024 ** 3),
                subdir=False,
                lock=True,
            )
        except ImportError:
            from lipsync_tpu.utils import kvlite

            return kvlite.open(path)
    raise ValueError(f"Unknown storage format: {storage_format}")


def _zarr_put(grp, name: str, data: np.ndarray) -> None:
    """Write one array member across backends: zarrlite takes
    ``create_array(name, data)``; zarr-python 3 wants keyword
    shape/dtype then assignment; zarr-python 2 has ``create_dataset``."""
    try:
        grp.create_array(name, data)  # zarrlite
        return
    except TypeError:
        pass
    except AttributeError:
        grp.create_dataset(name, data=data)  # zarr-python 2.x
        return
    arr = grp.create_array(name, shape=data.shape, dtype=data.dtype)
    arr[:] = data  # zarr-python 3.x


def _store_sample(
    store,
    storage_format: str,
    out_dir: Path,
    key: str,
    visual: np.ndarray,
    audio: np.ndarray,
) -> dict:
    """Persist one sample; returns storage fields for the manifest record."""
    if storage_format == "npy":
        visual_rel = f"{key}_visual.npy"
        audio_rel = f"{key}_audio.npy"
        np.save(out_dir / visual_rel, visual)
        np.save(out_dir / audio_rel, audio)
        return {"visual_relpath": visual_rel, "audio_relpath": audio_rel}
    if storage_format == "zarr":
        grp = store.require_group(key)
        _zarr_put(grp, "visual", visual)
        _zarr_put(grp, "audio", audio)
        return {}
    # lmdb: one npz blob per key (reference precompute :148-153)
    import io

    buf = io.BytesIO()
    np.savez(buf, visual=visual, audio=audio)
    with store.begin(write=True) as txn:
        txn.put(key.encode("utf-8"), buf.getvalue())
    return {}


def precompute_one(
    path: Path,
    label: int,
    out_dir: Path,
    index: int,
    mode: str,
    video_frames: int,
    audio_frames: int,
    target_fps: float,
    backend=None,
    use_face_detection: bool = True,
    storage_format: str = "npy",
    store=None,
) -> dict:
    key = f"sample_{index:06d}"
    if mode == "fixed_clip":
        visual = preprocess_video(
            path, max_frames=video_frames, backend=backend,
            use_face_detection=use_face_detection,
        )  # (T, 96, 96, 3) float32
        audio = preprocess_audio(path, target_frames=audio_frames)  # (80, T)
    else:  # full_sequence
        frames = ingest.read_video(path, target_fps=target_fps)
        if use_face_detection:
            tracks = detect_and_crop_tracks(
                frames, backend=backend, max_tracks=1
            )
            if not tracks:
                raise ValueError("no face track")
            visual = (tracks[0].crops * 255.0).astype(np.uint8)
        else:
            from lipsync_tpu.preprocessing.face_detection import (
                center_crop_box,
            )
            from lipsync_tpu.preprocessing.video import crop_track_on_device

            h, w = frames.shape[1:3]
            box = center_crop_box(h, w, 96)
            crops = crop_track_on_device(frames, [box] * len(frames), 0, 96)
            visual = (crops * 255.0).astype(np.uint8)
        audio = preprocess_audio(path)  # full (80, T)

    storage_fields = _store_sample(
        store, storage_format, out_dir, key, visual, audio
    )
    rec = {
        "key": key,
        "source_path": str(path),
        "label": int(label),
        "precompute_mode": mode,
        "storage_format": storage_format,
        "target_fps": target_fps,
        "mel_hz": 100.0,
        "visual_shape": list(visual.shape),
        "audio_shape": list(audio.shape),
    }
    rec.update(storage_fields)
    return rec


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--mode", choices=["fixed_clip", "full_sequence"],
                   default="full_sequence")
    p.add_argument("--video-frames", type=int, default=32)
    p.add_argument("--audio-frames", type=int, default=128)
    p.add_argument("--target-fps", type=float, default=15.0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--no-face-detection", action="store_true")
    p.add_argument("--storage-format", choices=["npy", "zarr", "lmdb"],
                   default="zarr",
                   help="Tensor store (reference default: zarr; zarr here "
                        "needs no wheel — in-repo v2 codec)")
    p.add_argument("--lmdb-map-size-gb", type=int, default=16)
    p.add_argument("--platform", choices=["cpu", "auto"], default="cpu",
                   help="JAX backend for the tiny per-clip device ops "
                        "(parsed before backend init; default cpu — "
                        "dispatch RTT dominates on a remote accelerator)")
    args = p.parse_args()

    out = args.output_dir
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.jsonl"
    store = _open_store(out, args.storage_format, args.lmdb_map_size_gb)

    done_sources = set()
    records = []
    if manifest_path.exists():  # incremental resume by source path
        for line in manifest_path.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                records.append(rec)
                done_sources.add(rec["source_path"])
        logger.info("Resuming: %d samples already precomputed", len(records))

    samples = discover_video_samples(args.data_dir)
    if args.limit:
        samples = samples[: args.limit]
    logger.info("Discovered %d samples", len(samples))

    n_done, n_failed = 0, 0
    with manifest_path.open("a") as mf:
        for path, label in samples:
            if str(path) in done_sources:
                continue
            try:
                rec = precompute_one(
                    path, label, out, len(records), args.mode,
                    args.video_frames, args.audio_frames, args.target_fps,
                    use_face_detection=not args.no_face_detection,
                    storage_format=args.storage_format, store=store,
                )
            except Exception as e:
                logger.warning("Failed %s: %s", path, e)
                n_failed += 1
                continue
            records.append(rec)
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
            n_done += 1
            if n_done % 25 == 0:
                logger.info("Precomputed %d samples (%d failed)",
                            n_done, n_failed)
    if args.storage_format == "lmdb" and store is not None:
        store.sync()
        store.close()
    logger.info("Done: %d new samples, %d failed, %d total",
                n_done, n_failed, len(records))


if __name__ == "__main__":
    main()

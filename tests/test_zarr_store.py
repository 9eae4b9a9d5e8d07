"""zarr-v2 tensor store: codec round-trips + dataset/precompute integration.

Covers the reference's zarr storage contract
(`/root/reference/scripts/precompute_training_tensors.py:341-353` layout
``samples.zarr/<key>/{visual,audio}``; `dataset.py:268-285,312-318` reads)
via the dependency-free codec in ``lipsync_tpu.utils.zarrlite``.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

from lipsync_tpu.training.data import BatchLoader, LipSyncDataset
from lipsync_tpu.utils import zarrlite

REPO = Path(__file__).resolve().parent.parent


# ── codec round-trips ────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((40, 8, 8, 3), np.uint8),
        ((80, 280), np.float32),
        ((7,), np.int64),
        ((5, 3), np.float64),
    ],
)
def test_array_roundtrip(tmp_path, rng, shape, dtype):
    data = (rng.rand(*shape) * 200).astype(dtype)
    root = zarrlite.open_group(tmp_path / "s.zarr", mode="a")
    grp = root.require_group("sample_000000")
    grp.create_array("x", data)
    back = zarrlite.open_group(tmp_path / "s.zarr")["sample_000000"]["x"][:]
    np.testing.assert_array_equal(back, data)
    assert back.dtype == dtype


def test_multi_chunk_edge_chunks(tmp_path, rng):
    """Chunk grid with ragged edge chunks reassembles exactly."""
    data = rng.randint(0, 255, (50, 9, 7)).astype(np.uint8)
    root = zarrlite.open_group(tmp_path / "s.zarr", mode="a")
    root.create_array("x", data, chunks=(16, 4, 7))
    arr = zarrlite.open_group(tmp_path / "s.zarr")["x"]
    assert arr.chunks == (16, 4, 7)
    # 4 x 3 x 1 chunk grid, edges padded on disk but trimmed on read.
    np.testing.assert_array_equal(arr[:], data)


def test_uncompressed_and_missing_chunk(tmp_path, rng):
    data = rng.rand(6, 4).astype(np.float32)
    root = zarrlite.open_group(tmp_path / "s.zarr", mode="a")
    root.create_array("x", data, chunks=(3, 4), compressor="none")
    # Delete one chunk: spec says missing chunks read as fill_value.
    (tmp_path / "s.zarr" / "x" / "1.0").unlink()
    got = zarrlite.open_group(tmp_path / "s.zarr")["x"][:]
    np.testing.assert_array_equal(got[:3], data[:3])
    np.testing.assert_array_equal(got[3:], np.zeros((3, 4), np.float32))


def test_group_protocol(tmp_path, rng):
    root = zarrlite.open_group(tmp_path / "s.zarr", mode="a")
    g = root.require_group("sample_000001")
    g.create_array("visual", np.zeros((4, 4), np.uint8))
    ro = zarrlite.open_group(tmp_path / "s.zarr")
    assert "sample_000001" in ro
    assert "sample_000002" not in ro
    assert list(ro.keys()) == ["sample_000001"]
    with pytest.raises(KeyError):
        ro["nope"]
    with pytest.raises(zarrlite.ZarrLiteError):
        ro.require_group("new")  # read-only


def test_blosc_rejected_with_clear_error(tmp_path):
    arr_dir = tmp_path / "s.zarr" / "x"
    arr_dir.mkdir(parents=True)
    (tmp_path / "s.zarr" / ".zgroup").write_text('{"zarr_format": 2}')
    (arr_dir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f4",
        "compressor": {"id": "blosc", "cname": "lz4"},
        "fill_value": 0, "order": "C", "filters": None,
    }))
    (arr_dir / "0").write_bytes(b"xxxx")
    with pytest.raises(zarrlite.ZarrLiteError, match="blosc"):
        zarrlite.open_group(tmp_path / "s.zarr")["x"][:]


# ── dataset integration ──────────────────────────────────────────────────


def _write_zarr_dataset(out: Path, rng, n=6, mode="full_sequence"):
    out.mkdir(parents=True, exist_ok=True)
    root = zarrlite.open_group(out / "samples.zarr", mode="a")
    records = []
    for i in range(n):
        key = f"sample_{i:06d}"
        if mode == "full_sequence":
            visual = rng.randint(0, 255, (40, 8, 8, 3)).astype(np.uint8)
            audio = (rng.rand(80, 280).astype(np.float32) * 80) - 80
        else:
            visual = rng.rand(16, 8, 8, 3).astype(np.float32)
            audio = (rng.rand(80, 64).astype(np.float32) * 80) - 80
        grp = root.require_group(key)
        grp.create_array("visual", visual)
        grp.create_array("audio", audio)
        records.append({
            "key": key, "source_path": f"/src/{key}.mp4", "label": i % 2,
            "precompute_mode": mode, "storage_format": "zarr",
            "target_fps": 15.0, "mel_hz": 100.0,
        })
    (out / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in records)
    )
    return out


def test_dataset_reads_zarr_full_sequence(tmp_path, rng):
    pre = _write_zarr_dataset(tmp_path / "pre", rng)
    ds = LipSyncDataset(
        preprocessed_dir=pre, video_frames=16, audio_frames=64
    )
    assert ds.storage_format == "zarr"  # auto-detected from the manifest
    v, a, label = ds.get_item(0, train_mode_override=False)
    assert v.shape == (16, 8, 8, 3) and a.shape == (80, 64)
    assert 0.0 <= v.min() and v.max() <= 1.0
    loader = BatchLoader(ds, batch_size=4, shuffle=False)
    assert sum(b["label"].shape[0] for b in loader) == 6


def test_dataset_zarr_matches_npy(tmp_path, rng):
    """Same tensors through zarr and npy stores -> identical samples."""
    seed_state = rng.get_state()
    pre_z = _write_zarr_dataset(tmp_path / "z", rng, n=3)
    rng.set_state(seed_state)
    pre_n = tmp_path / "n"
    pre_n.mkdir()
    records = []
    for i in range(3):
        key = f"sample_{i:06d}"
        visual = rng.randint(0, 255, (40, 8, 8, 3)).astype(np.uint8)
        audio = (rng.rand(80, 280).astype(np.float32) * 80) - 80
        np.save(pre_n / f"{key}_visual.npy", visual)
        np.save(pre_n / f"{key}_audio.npy", audio)
        records.append({
            "key": key, "source_path": f"/src/{key}.mp4", "label": i % 2,
            "visual_relpath": f"{key}_visual.npy",
            "audio_relpath": f"{key}_audio.npy",
            "precompute_mode": "full_sequence", "storage_format": "npy",
            "target_fps": 15.0, "mel_hz": 100.0,
        })
    (pre_n / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in records)
    )
    ds_z = LipSyncDataset(preprocessed_dir=pre_z, video_frames=16,
                          audio_frames=64)
    ds_n = LipSyncDataset(preprocessed_dir=pre_n, video_frames=16,
                          audio_frames=64)
    for i in range(3):
        vz, az, lz = ds_z.get_item(i, train_mode_override=False)
        vn, an, ln = ds_n.get_item(i, train_mode_override=False)
        np.testing.assert_array_equal(vz, vn)
        np.testing.assert_array_equal(az, an)
        assert lz == ln


def test_precompute_store_helpers_zarr(tmp_path, rng):
    """The precompute script's storage helpers write the reference layout."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from precompute_training_tensors import _open_store, _store_sample
    finally:
        sys.path.remove(str(REPO / "scripts"))
    store = _open_store(tmp_path, "zarr")
    visual = rng.randint(0, 255, (20, 8, 8, 3)).astype(np.uint8)
    audio = rng.rand(80, 130).astype(np.float32)
    fields = _store_sample(store, "zarr", tmp_path, "sample_000000",
                           visual, audio)
    assert fields == {}  # zarr records carry no relpaths
    root = zarrlite.open_group(tmp_path / "samples.zarr")
    np.testing.assert_array_equal(
        root["sample_000000"]["visual"][:], visual
    )
    np.testing.assert_array_equal(root["sample_000000"]["audio"][:], audio)


def test_lmdb_format_works_without_wheel(tmp_path, rng):
    """`--storage-format lmdb` without the wheel routes to the sqlite-backed
    kvlite store; the dataset reads it back through the same lmdb branch."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from precompute_training_tensors import _open_store, _store_sample
    finally:
        sys.path.remove(str(REPO / "scripts"))
    store = _open_store(tmp_path, "lmdb")
    visual = rng.randint(0, 255, (40, 8, 8, 3)).astype(np.uint8)
    audio = (rng.rand(80, 280).astype(np.float32) * 80) - 80
    fields = _store_sample(store, "lmdb", tmp_path, "sample_000000",
                           visual, audio)
    assert fields == {}
    store.sync()
    store.close()

    (tmp_path / "manifest.jsonl").write_text(json.dumps({
        "key": "sample_000000", "source_path": "/src/a.mp4", "label": 1,
        "precompute_mode": "full_sequence", "storage_format": "lmdb",
        "target_fps": 15.0, "mel_hz": 100.0,
    }))
    ds = LipSyncDataset(preprocessed_dir=tmp_path, video_frames=16,
                        audio_frames=64)
    assert ds.storage_format == "lmdb"
    v, a, label = ds.get_item(0, train_mode_override=False)
    assert v.shape == (16, 8, 8, 3) and a.shape == (80, 64)
    assert label == 1.0

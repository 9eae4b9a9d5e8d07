"""kvlite: the sqlite-backed stand-in for the reference's LMDB tensor store
(`/root/reference/scripts/precompute_training_tensors.py:322-340` writes,
`/root/reference/app/training/dataset.py:245-267` reads — one npz blob per
sample key in a single file)."""

import io

import numpy as np
import pytest

from lipsync_tpu.utils import kvlite


def test_put_get_roundtrip(tmp_path):
    env = kvlite.open(tmp_path / "samples.lmdb")
    with env.begin(write=True) as txn:
        txn.put(b"a", b"\x00\x01binary\xff")
        txn.put(b"b", b"second")
    with env.begin() as txn:
        assert txn.get(b"a") == b"\x00\x01binary\xff"
        assert txn.get(b"b") == b"second"
        assert txn.get(b"missing") is None
    assert env.stat() == {"entries": 2}
    env.close()


def test_npz_blob_roundtrip(tmp_path, rng):
    """The exact store/load pattern of the lmdb branch: compressed-npz
    blob per key, exact tensor recovery."""
    visual = rng.randint(0, 255, (40, 96, 96, 3)).astype(np.uint8)
    audio = (rng.rand(80, 280).astype(np.float32) * 80) - 80
    buf = io.BytesIO()
    np.savez(buf, visual=visual, audio=audio)
    env = kvlite.open(tmp_path / "samples.lmdb")
    with env.begin(write=True) as txn:
        txn.put(b"sample_000000", buf.getvalue())
    env.close()

    ro = kvlite.open(tmp_path / "samples.lmdb", readonly=True)
    with ro.begin() as txn:
        blob = txn.get(b"sample_000000")
    with np.load(io.BytesIO(blob), allow_pickle=False) as data:
        np.testing.assert_array_equal(data["visual"], visual)
        np.testing.assert_array_equal(data["audio"], audio)
    ro.close()


def test_overwrite_and_delete(tmp_path):
    env = kvlite.open(tmp_path / "s.lmdb")
    with env.begin(write=True) as txn:
        txn.put(b"k", b"v1")
        txn.put(b"k", b"v2")  # INSERT OR REPLACE
    with env.begin() as txn:
        assert txn.get(b"k") == b"v2"
    with env.begin(write=True) as txn:
        assert txn.delete(b"k") is True
        assert txn.delete(b"k") is False
    with env.begin() as txn:
        assert txn.get(b"k") is None
    env.close()


def test_write_txn_rolls_back_on_exception(tmp_path):
    env = kvlite.open(tmp_path / "s.lmdb")
    with env.begin(write=True) as txn:
        txn.put(b"committed", b"1")
    with pytest.raises(RuntimeError, match="boom"):
        with env.begin(write=True) as txn:
            txn.put(b"doomed", b"1")
            raise RuntimeError("boom")
    with env.begin() as txn:
        assert txn.get(b"committed") == b"1"
        assert txn.get(b"doomed") is None
    env.close()


def test_readonly_guards(tmp_path):
    path = tmp_path / "s.lmdb"
    with pytest.raises(kvlite.Error, match="No such"):
        kvlite.open(path, readonly=True)
    kvlite.open(path).close()  # create
    ro = kvlite.open(path, readonly=True)
    with pytest.raises(kvlite.Error, match="read-only"):
        ro.begin(write=True)
    with ro.begin() as txn:
        with pytest.raises(kvlite.Error, match="read-only"):
            txn.put(b"k", b"v")
    ro.close()


def test_resume_appends_to_existing_store(tmp_path):
    """Precompute resume reopens the same file and adds keys."""
    path = tmp_path / "s.lmdb"
    env = kvlite.open(path, map_size=1 << 30, subdir=False, lock=True)
    with env.begin(write=True) as txn:
        txn.put(b"first", b"1")
    env.sync()
    env.close()
    env2 = kvlite.open(path)
    with env2.begin(write=True) as txn:
        txn.put(b"second", b"2")
    with env2.begin() as txn:
        assert txn.get(b"first") == b"1"
        assert txn.get(b"second") == b"2"
    env2.close()


def test_file_type_detection(tmp_path):
    path = tmp_path / "s.lmdb"
    kvlite.open(path).close()
    assert kvlite.is_sqlite_file(path)
    assert not kvlite.is_lmdb_file(path)
    # A synthetic wheel-written LMDB header: meta page with magic at +16.
    fake = tmp_path / "real.lmdb"
    fake.write_bytes(b"\x00" * 16 + (0xBEEFC0DE).to_bytes(4, "little"))
    assert kvlite.is_lmdb_file(fake)
    assert not kvlite.is_sqlite_file(fake)
    assert not kvlite.is_sqlite_file(tmp_path / "absent")
    assert not kvlite.is_lmdb_file(tmp_path / "absent")

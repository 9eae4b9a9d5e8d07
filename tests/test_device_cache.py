"""Device-resident dataset cache: parity with the host window sampler,
ragged-batch masking, and mesh-sharded gathers."""

import json

import numpy as np
import pytest

from lipsync_tpu.training.data import LipSyncDataset
from lipsync_tpu.training.device_cache import DeviceDatasetCache

VF, AF = 16, 64


@pytest.fixture()
def pre_dir(tmp_path, rng):
    """Six full_sequence clips incl. one shorter than the window and one
    with a short mel track (exercises both tail-pad paths)."""
    out = tmp_path / "pre"
    out.mkdir()
    records = []
    shapes = [(40, 280), (40, 280), (12, 80), (40, 280), (25, 160),
              (40, 107)]
    for i, (t, ta) in enumerate(shapes):
        key = f"sample_{i:06d}"
        visual = rng.randint(0, 255, (t, 8, 8, 3)).astype(np.uint8)
        audio = (rng.rand(80, ta).astype(np.float32) * 80) - 80
        np.save(out / f"{key}_visual.npy", visual)
        np.save(out / f"{key}_audio.npy", audio)
        records.append({
            "key": key, "source_path": f"/src/{key}.mp4", "label": i % 2,
            "visual_relpath": f"{key}_visual.npy",
            "audio_relpath": f"{key}_audio.npy",
            "precompute_mode": "full_sequence",
            "target_fps": 15.0, "mel_hz": 100.0,
        })
    (out / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in records)
    )
    return out


def _dataset(pre_dir):
    return LipSyncDataset(
        preprocessed_dir=pre_dir, video_frames=VF, audio_frames=AF,
        uint8_visual=True,
    )


def test_eval_batches_match_host_sampler(pre_dir):
    ds = _dataset(pre_dir)
    cache = DeviceDatasetCache(ds)
    batches = list(cache.batches(range(len(ds)), batch_size=4,
                                 train_mode=False))
    got_v = np.concatenate([np.asarray(b["visual"]) for b in batches])
    got_a = np.concatenate([np.asarray(b["audio"])[..., 0]
                            for b in batches])
    got_l = np.concatenate([np.asarray(b["label"]) for b in batches])
    for i in range(len(ds)):
        visual, audio, label = ds._load_preprocessed(
            i, train_mode_override=False
        )
        np.testing.assert_array_equal(got_v[i], visual,
                                      err_msg=f"visual clip {i}")
        np.testing.assert_allclose(got_a[i], audio, rtol=0, atol=1e-6,
                                   err_msg=f"audio clip {i}")
        assert got_l[i] == label
    # Eval tail batch stays ragged (BatchLoader behavior).
    assert batches[-1]["visual"].shape[0] == len(ds) % 4


def test_train_batches_padded_and_masked(pre_dir):
    ds = _dataset(pre_dir)
    cache = DeviceDatasetCache(ds)
    rng = np.random.RandomState(0)
    batches = list(cache.batches(range(len(ds)), batch_size=4, rng=rng,
                                 train_mode=True))
    assert all(b["visual"].shape == (4, VF, 8, 8, 3) for b in batches)
    assert all(b["audio"].shape == (4, 80, AF, 1) for b in batches)
    masks = [np.asarray(b["sample_mask"]) for b in batches]
    assert masks[0].tolist() == [1, 1, 1, 1]
    assert masks[-1].tolist() == [1, 1, 0, 0]  # 6 clips -> ragged 2+2 pad
    # Window contents are valid slices: uint8 passthrough, f32 mel dB.
    assert np.asarray(batches[0]["visual"]).dtype == np.uint8
    a = np.asarray(batches[0]["audio"])
    assert a.min() >= -80.001 and a.max() <= 0.001


def test_train_start_sampling_spans_clip(pre_dir):
    """Random starts cover more than one position for long clips."""
    ds = _dataset(pre_dir)
    cache = DeviceDatasetCache(ds)
    rng = np.random.RandomState(1)
    long_idx = 0  # t=40 > VF=16 -> 25 valid starts
    seen = set()
    host_visual = np.load(pre_dir / "sample_000000_visual.npy")
    for _ in range(12):
        b = next(iter(cache.batches([long_idx], batch_size=1, rng=rng,
                                    train_mode=True)))
        win = np.asarray(b["visual"])[0]
        for s in range(40 - VF + 1):
            if np.array_equal(win, host_visual[s: s + VF]):
                seen.add(s)
                break
    assert len(seen) > 1


def test_train_cli_with_device_cache(pre_dir, tmp_path):
    """`train.py --device-cache` end to end on the 8-virtual-device mesh
    (conftest): corpus uploads once, epochs run from on-device gathers."""
    from lipsync_tpu.training.train import build_argparser, run_training

    args = build_argparser().parse_args([
        "--preprocessed-dir", str(pre_dir),
        "--output-dir", str(tmp_path / "w"),
        "--epochs", "1", "--batch-size", "8",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--phase2-start-epoch", "0", "--phase3-start-epoch", "0",
        "--device-cache", "--val-split", "0.34",
    ])
    history = run_training(args)
    assert history["epoch"] == 0
    assert np.isfinite(history["val_loss"])
    assert (tmp_path / "w" / "latest" / "metadata.json").exists()


def test_finetune_cli_with_device_cache(pre_dir, tmp_path):
    """`finetune.py --device-cache` end to end on the 8-virtual-device
    mesh: partial checkpoint load, cached train epochs, F1 sweep over
    cache-served val batches."""
    from lipsync_tpu.training.finetune import (
        build_argparser as ft_argparser, run_finetune,
    )
    from lipsync_tpu.training.train import build_argparser, run_training

    base = build_argparser().parse_args([
        "--preprocessed-dir", str(pre_dir),
        "--output-dir", str(tmp_path / "base"),
        "--epochs", "1", "--batch-size", "8",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--phase2-start-epoch", "0", "--phase3-start-epoch", "0",
        "--device-cache", "--val-split", "0.34",
    ])
    run_training(base)

    args = ft_argparser().parse_args([
        "--preprocessed-dir", str(pre_dir),
        "--checkpoint", str(tmp_path / "base" / "latest"),
        "--output-dir", str(tmp_path / "ft"),
        "--epochs", "1", "--frozen-epochs", "0", "--batch-size", "8",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--device-cache", "--val-split", "0.34",
    ])
    history = run_finetune(args)
    assert np.isfinite(history["val_loss"])
    assert (tmp_path / "ft" / "latest" / "metadata.json").exists()


def test_sharded_gather_runs_train_step(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    import optax

    from lipsync_tpu.models.lip_sync_model import LipSyncModel, ModelConfig
    from lipsync_tpu.parallel import mesh as mesh_lib
    from lipsync_tpu.training.steps import create_train_state, \
        make_train_step

    # Same tiny geometry as test_training_step (reuses cached programs).
    vf, af, crop = 4, 16, 32
    out = tmp_path / "pre32"
    out.mkdir()
    records = []
    for i in range(10):
        key = f"sample_{i:06d}"
        np.save(out / f"{key}_visual.npy",
                rng.randint(0, 255, (12, crop, crop, 3)).astype(np.uint8))
        np.save(out / f"{key}_audio.npy",
                (rng.rand(80, 80).astype(np.float32) * 80) - 80)
        records.append({
            "key": key, "source_path": f"/src/{key}.mp4", "label": i % 2,
            "visual_relpath": f"{key}_visual.npy",
            "audio_relpath": f"{key}_audio.npy",
            "precompute_mode": "full_sequence",
            "target_fps": 15.0, "mel_hz": 100.0,
        })
    (out / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in records)
    )
    ds = LipSyncDataset(preprocessed_dir=out, video_frames=vf,
                        audio_frames=af, uint8_visual=True)

    mesh = mesh_lib.make_mesh(8)
    cache = DeviceDatasetCache(ds, mesh=mesh)
    cfg = ModelConfig(video_frames=vf, crop_size=crop, mel_bins=80,
                      audio_frames=af)
    model = LipSyncModel(cfg, dtype=jnp.float32)
    opt = optax.adam(1e-3)
    state = create_train_state(
        model, opt, jax.random.PRNGKey(0),
        (jnp.zeros((1, vf, crop, crop, 3)), jnp.zeros((1, 80, af, 1))),
    )
    step = jax.jit(make_train_step(model, opt))
    # 10 clips at batch 8 -> one full + one ragged (pad+mask) batch.
    batches = list(cache.batches(range(len(ds)), batch_size=8,
                                 rng=np.random.RandomState(0),
                                 train_mode=True))
    assert len(batches) == 2
    assert len(batches[0]["visual"].sharding.device_set) == 8
    assert np.asarray(batches[1]["sample_mask"]).sum() == 2
    for b in batches:
        state, metrics = step(state, b)
        assert np.isfinite(float(metrics["loss"]))

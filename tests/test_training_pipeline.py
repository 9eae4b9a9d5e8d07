"""Training data pipeline + phased training CLI tests (tiny geometry)."""

import json
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from lipsync_tpu.training.data import (
    Augmentations,
    BatchLoader,
    LipSyncDataset,
    discover_video_samples,
    safe_collate,
    sample_aligned_contiguous_clip,
)
from lipsync_tpu.training.optimizers import (
    ReduceLROnPlateau,
    current_learning_rate,
    label_params,
    make_phase_optimizer,
    map_learning_rates,
)


# ── discovery + windowing ────────────────────────────────────────────────


def test_discover_real_fake_dirs(tmp_path):
    (tmp_path / "0_real").mkdir()
    (tmp_path / "1_fake").mkdir()
    (tmp_path / "0_real" / "a.mp4").write_bytes(b"x")
    (tmp_path / "1_fake" / "b.MOV").write_bytes(b"x")
    samples = discover_video_samples(tmp_path)
    labels = {p.name.lower(): label for p, label in samples}
    assert labels == {"a.mp4": 1, "b.mov": 0}


def test_discover_name_heuristics(tmp_path):
    (tmp_path / "wav2lip_out").mkdir()
    (tmp_path / "natural_clips").mkdir()
    (tmp_path / "wav2lip_out" / "x.avi").write_bytes(b"x")
    (tmp_path / "natural_clips" / "y.mp4").write_bytes(b"x")
    labels = {p.parent.name: l for p, l in discover_video_samples(tmp_path)}
    assert labels == {"wav2lip_out": 0, "natural_clips": 1}


def test_sample_aligned_clip_alignment(rng):
    """mel_start = start/fps * 100 Hz exactly (dataset.py:426-433)."""
    t_total = 90
    visual = rng.randint(0, 255, (t_total, 8, 8, 3)).astype(np.uint8)
    # Audio where mel value == frame index (to verify alignment).
    a_total = 600
    audio = np.tile(np.arange(a_total, dtype=np.float32), (80, 1))
    v, a = sample_aligned_contiguous_clip(
        visual, audio, video_frames=32, audio_frames=128,
        target_fps=15.0, train_mode=False,
    )
    assert v.shape == (32, 8, 8, 3) and v.max() <= 1.0
    assert a.shape == (80, 128)
    start = (t_total - 32) // 2  # center window
    expected_mel_start = round(start / 15.0 * 100.0)
    assert a[0, 0] == expected_mel_start
    # Window spans 32/15*100 ≈ 213 mel frames resampled to 128.
    assert abs(a[0, -1] - (expected_mel_start + 212)) <= 1


def test_sample_aligned_clip_short_raises(rng):
    visual = rng.randint(0, 255, (10, 8, 8, 3)).astype(np.uint8)
    audio = np.zeros((80, 100), np.float32)
    with pytest.raises(ValueError, match="too short"):
        sample_aligned_contiguous_clip(visual, audio, video_frames=32)


def test_sample_aligned_clip_pads_tail(rng):
    visual = rng.randint(0, 255, (20, 8, 8, 3)).astype(np.uint8)
    audio = np.zeros((80, 140), np.float32)
    v, a = sample_aligned_contiguous_clip(
        visual, audio, video_frames=32, train_mode=True
    )
    assert v.shape[0] == 32
    np.testing.assert_array_equal(v[19], v[31])  # last-frame padding


# ── augmentation + collate ───────────────────────────────────────────────


def test_augmentations_preserve_shapes_and_ranges(rng):
    aug = Augmentations()
    visual = rng.rand(8, 16, 16, 3).astype(np.float32)
    audio = (rng.rand(80, 32).astype(np.float32) * 80) - 80
    for _ in range(5):
        v, a = aug(visual, audio, rng=rng)
        assert v.shape == visual.shape and a.shape == audio.shape
        assert 0.0 <= v.min() and v.max() <= 1.0
        assert -80.0 <= a.min() and a.max() <= 0.0


def test_safe_collate_drops_none(rng):
    s = (np.zeros((4, 8, 8, 3), np.float32), np.zeros((80, 16), np.float32),
         np.float32(1))
    batch = safe_collate([s, None, s])
    assert batch["visual"].shape[0] == 2
    assert batch["audio"].shape == (2, 80, 16, 1)
    assert safe_collate([None, None]) is None


# ── preprocessed dataset + loader ────────────────────────────────────────


@pytest.fixture()
def preprocessed_dir(tmp_path, rng):
    out = tmp_path / "pre"
    out.mkdir()
    records = []
    for i in range(6):
        key = f"sample_{i:06d}"
        visual = rng.randint(0, 255, (40, 8, 8, 3)).astype(np.uint8)
        audio = (rng.rand(80, 280).astype(np.float32) * 80) - 80
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


def test_preprocessed_dataset_and_loader(preprocessed_dir):
    ds = LipSyncDataset(
        preprocessed_dir=preprocessed_dir, video_frames=16, audio_frames=64
    )
    assert len(ds) == 6
    v, a, label = ds.get_item(0, train_mode_override=False)
    assert v.shape == (16, 8, 8, 3) and a.shape == (80, 64)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert sum(b["label"].shape[0] for b in batches) == 6
    assert batches[0]["visual"].shape[1:] == (16, 8, 8, 3)
    assert batches[0]["audio"].shape[1:] == (80, 64, 1)


def test_loader_skips_failed_samples(preprocessed_dir):
    ds = LipSyncDataset(
        preprocessed_dir=preprocessed_dir, video_frames=16, audio_frames=64
    )
    # Corrupt one sample's file.
    (preprocessed_dir / "sample_000002_visual.npy").write_bytes(b"garbage")
    loader = BatchLoader(ds, batch_size=2, shuffle=False)
    total = sum(b["label"].shape[0] for b in loader)
    assert total == 5  # one dropped


def test_loader_augment_crash_raises_not_hangs(preprocessed_dir):
    """A raising augmentation must surface, not deadlock the consumer
    (the producer thread always enqueues its sentinel; round-3 fix)."""

    class _Boom:
        def __call__(self, visual, audio, rng=None):
            raise RuntimeError("augment boom")

    ds = LipSyncDataset(
        preprocessed_dir=preprocessed_dir, video_frames=16, audio_frames=64
    )
    loader = BatchLoader(ds, batch_size=2, shuffle=False, augment=_Boom())
    with pytest.raises(RuntimeError, match="augment boom"):
        list(loader)


def test_loader_early_break_does_not_leak_producer(preprocessed_dir):
    """Breaking out of iteration stops the producer thread promptly even
    with a full prefetch queue."""
    import threading
    import time

    ds = LipSyncDataset(
        preprocessed_dir=preprocessed_dir, video_frames=16, audio_frames=64
    )
    before = threading.active_count()
    for _ in range(3):
        for batch in BatchLoader(ds, batch_size=1, shuffle=False, prefetch=1):
            break  # consume one batch then abandon the iterator
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


# ── phased optimizer ─────────────────────────────────────────────────────


def _fake_params():
    return {
        "visual_encoder": {"w": np.ones(3, np.float32)},
        "audio_encoder": {"w": np.ones(3, np.float32)},
        "classifier": {"w": np.ones(3, np.float32)},
    }


def test_phase1_freezes_encoders():
    import jax.numpy as jnp

    params = _fake_params()
    tx = make_phase_optimizer(1, 1e-3, 1e-4)
    state = tx.init(params)
    grads = {k: {"w": jnp.ones(3)} for k in params}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["visual_encoder"]["w"]) == 0)
    assert np.all(np.asarray(updates["audio_encoder"]["w"]) == 0)
    assert np.any(np.asarray(updates["classifier"]["w"]) != 0)


def test_phase2_trains_audio_only_encoder():
    import jax.numpy as jnp

    params = _fake_params()
    tx = make_phase_optimizer(2, 1e-3, 1e-4)
    state = tx.init(params)
    grads = {k: {"w": jnp.ones(3)} for k in params}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["visual_encoder"]["w"]) == 0)
    assert np.any(np.asarray(updates["audio_encoder"]["w"]) != 0)


def test_plateau_scheduler_halves_lr():
    params = _fake_params()
    tx = make_phase_optimizer(3, 1e-3, 1e-4)
    state = tx.init(params)
    assert current_learning_rate(state) == pytest.approx(1e-3)
    sched = ReduceLROnPlateau(factor=0.5, patience=2)
    state = sched.step(1.0, state)  # best
    for _ in range(3):  # patience exceeded
        state = sched.step(2.0, state)
    assert current_learning_rate(state) == pytest.approx(5e-4)


# ── end-to-end tiny training run via the CLI entry function ──────────────


def test_train_then_finetune_end_to_end(preprocessed_dir, tmp_path):
    """One combined CLI run: 2-epoch training with a phase transition, then
    2-epoch finetune from that checkpoint with an unfreeze transition.
    (Combined to amortize the expensive per-optimizer-build compiles on
    this 1-core box.)"""
    from lipsync_tpu.training.finetune import build_argparser, run_finetune
    from lipsync_tpu.training.train import (
        build_argparser as train_parser,
        run_training,
    )

    args = train_parser().parse_args([
        "--preprocessed-dir", str(preprocessed_dir),
        "--output-dir", str(tmp_path / "w"),
        "--epochs", "2", "--batch-size", "2",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--phase2-start-epoch", "1", "--phase3-start-epoch", "2",
        "--no-augment", "--val-split", "0.34",
    ])
    history = run_training(args)
    assert history["epoch"] == 1
    assert np.isfinite(history["val_loss"])
    out = tmp_path / "w"
    assert (out / "latest" / "metadata.json").exists()
    assert (out / "best_model_accuracy").exists()
    meta = json.loads((out / "latest" / "metadata.json").read_text())
    assert meta["video_frames"] == 4 and meta["phase"] == 2

    ft_args = build_argparser().parse_args([
        "--preprocessed-dir", str(preprocessed_dir),
        "--checkpoint", str(out / "latest"),
        "--output-dir", str(tmp_path / "ft"),
        "--epochs", "2", "--frozen-epochs", "1", "--batch-size", "2",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--no-augment",
    ])
    ft_history = run_finetune(ft_args)
    assert ft_history["epoch"] == 1
    ft_out = tmp_path / "ft"
    assert (ft_out / "best_model_f1").exists()
    assert (ft_out / "confusion_epoch_000.txt").exists()
    ft_meta = json.loads((ft_out / "latest" / "metadata.json").read_text())
    assert 0.05 <= ft_meta["f1_threshold"] <= 0.95


def test_finetune_sharded_with_device_augment(preprocessed_dir, tmp_path):
    """Finetune on the 8-virtual-device mesh (VERDICT r2 item 2): batches
    pad to a device multiple + shard, with on-device augmentation and the
    uint8 loader path. The 6-sample dataset makes every batch ragged."""
    import jax

    from lipsync_tpu.training.finetune import build_argparser, run_finetune
    from lipsync_tpu.training.train import (
        build_argparser as train_parser,
        run_training,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    args = train_parser().parse_args([
        "--preprocessed-dir", str(preprocessed_dir),
        "--output-dir", str(tmp_path / "w"),
        "--epochs", "1", "--batch-size", "4",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--phase3-start-epoch", "0",
        "--no-augment", "--val-split", "0.34",
    ])
    run_training(args)

    ft_args = build_argparser().parse_args([
        "--preprocessed-dir", str(preprocessed_dir),
        "--checkpoint", str(tmp_path / "w" / "latest"),
        "--output-dir", str(tmp_path / "ft"),
        "--epochs", "1", "--frozen-epochs", "2", "--batch-size", "4",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--device-augment",
    ])
    ft_history = run_finetune(ft_args)
    assert np.isfinite(ft_history["val_loss"])
    assert (tmp_path / "ft" / "latest" / "metadata.json").exists()


def test_training_resume(preprocessed_dir, tmp_path):
    """Resume restores epoch counter, best metrics, and weights
    (train.py:550-601 phase-aware rebuild semantics)."""
    from lipsync_tpu.training.train import build_argparser, run_training

    base = [
        "--preprocessed-dir", str(preprocessed_dir),
        "--output-dir", str(tmp_path / "w"),
        "--batch-size", "2",
        "--video-frames", "4", "--audio-frames", "16", "--crop-size", "8",
        "--no-augment", "--val-split", "0.34",
    ]
    run_training(build_argparser().parse_args(base + ["--epochs", "1"]))
    meta1 = json.loads(
        (tmp_path / "w" / "latest" / "metadata.json").read_text()
    )
    assert meta1["epoch"] == 0

    history = run_training(build_argparser().parse_args(
        base + ["--epochs", "2", "--resume", str(tmp_path / "w" / "latest")]
    ))
    assert history["epoch"] == 1  # continued, not restarted
    meta2 = json.loads(
        (tmp_path / "w" / "latest" / "metadata.json").read_text()
    )
    assert meta2["epoch"] == 1
    assert meta2["best_val_accuracy"] >= meta1["best_val_accuracy"]

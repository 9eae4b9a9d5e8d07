"""Device-side augmentation op (`lipsync_tpu.ops.augment`).

Validates parity of each transform against its host/NumPy reference and
the train-step integration (uint8 batches + on-device augmentation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lipsync_tpu.ops.augment import (
    AugmentConfig,
    _reflect_index,
    _rotate_frames,
    _speed_indices,
    augment_batch,
)


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def test_reflect_index_matches_numpy_reflect():
    n = 7
    idx = jnp.arange(-2 * n, 3 * n)
    got = np.asarray(_reflect_index(idx, n))
    # numpy 'symmetric' pad = reflect-with-edge-duplication
    ref = [int(np.pad(np.arange(n), (2 * n, 2 * n), mode="symmetric")[
        i + 2 * n]) for i in range(-2 * n, 3 * n)]
    np.testing.assert_array_equal(got, ref)


def test_speed_indices_match_host_warp():
    for t, speed in ((32, 0.9), (32, 1.1), (128, 1.07), (5, 0.93)):
        host = np.clip(
            np.linspace(0, t - 1, t) * speed, 0, t - 1
        ).astype(np.int64)
        dev = np.asarray(_speed_indices(t, jnp.float32(speed)))
        np.testing.assert_array_equal(dev, host)


def test_rotation_matches_cv2_warpaffine(rng):
    cv2 = pytest.importorskip("cv2")

    frames = rng.rand(2, 24, 24, 3).astype(np.float32)
    for angle in (11.5, -7.25):
        got = np.asarray(
            _rotate_frames(jnp.asarray(frames), jnp.float32(angle))
        )
        m = cv2.getRotationMatrix2D((12.0, 12.0), angle, 1.0)
        ref = np.stack([
            cv2.warpAffine(f, m, (24, 24), borderMode=cv2.BORDER_REFLECT)
            for f in frames
        ])
        # Interior parity is exact bilinear; the border ring can differ
        # where cv2 clamps source coords slightly differently.
        assert np.abs(got[:, 2:-2, 2:-2] - ref[:, 2:-2, 2:-2]).max() < 1e-5


def test_augment_batch_shapes_ranges_and_determinism(rng):
    visual = rng.rand(4, 8, 16, 16, 3).astype(np.float32)
    audio = (rng.rand(4, 80, 32, 1).astype(np.float32) * 80.0) - 80.0
    key = jax.random.PRNGKey(7)
    v1, a1 = augment_batch(key, jnp.asarray(visual), jnp.asarray(audio))
    v2, a2 = augment_batch(key, jnp.asarray(visual), jnp.asarray(audio))
    assert v1.shape == visual.shape and a1.shape == audio.shape
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert float(jnp.min(v1)) >= 0.0 and float(jnp.max(v1)) <= 1.0
    assert float(jnp.min(a1)) >= -80.0 and float(jnp.max(a1)) <= 0.0
    # Different key -> different draw.
    v3, _ = augment_batch(jax.random.PRNGKey(8), jnp.asarray(visual),
                          jnp.asarray(audio))
    assert np.abs(np.asarray(v3) - np.asarray(v1)).max() > 1e-4


def test_augment_batch_per_sample_independent(rng):
    """Samples in a batch draw independent parameters: augmenting a batch
    of two identical samples must produce two different outputs (w.h.p.)."""
    one = rng.rand(1, 8, 16, 16, 3).astype(np.float32)
    visual = np.concatenate([one, one], axis=0)
    audio = np.zeros((2, 80, 32, 1), np.float32) - 40.0
    v, _ = augment_batch(jax.random.PRNGKey(3), jnp.asarray(visual),
                         jnp.asarray(audio))
    assert np.abs(np.asarray(v[0]) - np.asarray(v[1])).max() > 1e-4


def test_augment_batch_uint8_and_disabled(rng):
    visual_u8 = rng.randint(0, 255, (2, 4, 8, 8, 3)).astype(np.uint8)
    audio = np.zeros((2, 80, 16, 1), np.float32) - 30.0
    cfg = AugmentConfig(enabled=False)
    v, a = augment_batch(jax.random.PRNGKey(0), jnp.asarray(visual_u8),
                         jnp.asarray(audio), cfg)
    np.testing.assert_allclose(
        np.asarray(v), visual_u8.astype(np.float32) / 255.0, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(a), audio)


def test_train_step_with_device_augment(rng):
    """The fused step accepts uint8 visual batches and augments on device;
    loss is finite and params update."""
    import optax

    from lipsync_tpu.models import LipSyncModel, ModelConfig
    from lipsync_tpu.training.steps import (
        LossConfig,
        create_train_state,
        make_train_step,
    )

    cfg = ModelConfig(video_frames=4, crop_size=16, audio_frames=16)
    model = LipSyncModel(cfg)
    opt = optax.adam(1e-3)
    example = (
        jnp.zeros((2, 4, 16, 16, 3)),
        jnp.zeros((2, 80, 16, 1)),
    )
    state = create_train_state(model, opt, jax.random.PRNGKey(0), example)
    step = jax.jit(make_train_step(
        model, opt, LossConfig(sync_shift_frames=(2,)),
        augment_cfg=AugmentConfig(),
    ))
    batch = {
        "visual": jnp.asarray(
            rng.randint(0, 255, (2, 4, 16, 16, 3)).astype(np.uint8)
        ),
        "audio": jnp.asarray(
            (rng.rand(2, 80, 16, 1).astype(np.float32) * 80.0) - 80.0
        ),
        "label": jnp.asarray([1.0, 0.0]),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaves_before = jax.tree_util.tree_leaves(state.params)
    leaves_after = jax.tree_util.tree_leaves(new_state.params)
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(leaves_before, leaves_after)
    )

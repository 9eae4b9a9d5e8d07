"""Utils tests: metrics golden vs the reference implementation, layout
round-trips, file manager."""

import numpy as np
import pytest

from lipsync_tpu.utils import layout
from lipsync_tpu.utils.file_manager import save_bytes_to_temp, split_av_paths
from lipsync_tpu.utils.metrics import (
    compute_metrics,
    compute_metrics_at_threshold,
    find_best_threshold,
)


@pytest.fixture(scope="module")
def ref_metrics(reference_on_path):
    if not reference_on_path:
        pytest.skip("reference repo unavailable")
    from app.utils import metrics as rm

    return rm


def test_compute_metrics_golden(ref_metrics, rng):
    """Reference signature: compute_metrics(y_true, y_pred, positive_label)
    with 1 = FAKE positive (metrics.py:25-76)."""
    pred_fake = rng.rand(50) > 0.5
    true_fake = rng.rand(50) > 0.5
    ours = compute_metrics(pred_fake, true_fake)
    theirs = ref_metrics.compute_metrics(
        [int(t) for t in true_fake], [int(p) for p in pred_fake]
    )
    for k in ("precision", "recall", "f1", "accuracy"):
        assert ours[k] == pytest.approx(theirs[k], abs=1e-5), k  # ref rounds to 6 dp


def test_metrics_at_threshold_golden(ref_metrics, rng):
    """Reference thresholds P(REAL): predicted real iff score >= t
    (metrics.py:79-100); ours thresholds P(FAKE) at 1-t — identical
    decisions away from the exact boundary."""
    p_real = rng.rand(60)
    true_fake = rng.rand(60) > 0.4
    for t in (0.3, 0.5, 0.7):
        ours = compute_metrics_at_threshold(1.0 - p_real, true_fake, 1.0 - t)
        theirs = ref_metrics.compute_metrics_at_threshold(
            [int(x) for x in true_fake], p_real.tolist(), t
        )
        for k in ("precision", "recall", "f1", "accuracy"):
            assert ours[k] == pytest.approx(theirs[k], abs=1e-5), (t, k)


def test_find_best_threshold_golden(ref_metrics, rng):
    """On a separable score set both sweeps find the perfect F1."""
    p_real = np.concatenate([rng.rand(30) * 0.4, 0.6 + rng.rand(30) * 0.4])
    true_fake = np.concatenate([np.ones(30, bool), np.zeros(30, bool)])
    ours_t, ours_m = find_best_threshold(1.0 - p_real, true_fake)
    theirs = ref_metrics.find_best_threshold(
        [int(x) for x in true_fake], p_real.tolist()
    )
    assert ours_m["f1"] == pytest.approx(1.0)
    assert theirs["f1"] == pytest.approx(1.0)
    # Thresholds live on mirrored scales (fake-prob vs real-prob).
    assert 0.0 < ours_t < 1.0 and 0.0 < theirs["best_threshold"] < 1.0


def test_layout_roundtrips(rng):
    vis = rng.rand(2, 3, 8, 16, 16).astype(np.float32)
    native = layout.visual_from_torch(vis)
    assert native.shape == (2, 8, 16, 16, 3)
    np.testing.assert_array_equal(layout.visual_to_torch(native), vis)

    vis1 = vis[0]
    native1 = layout.visual_from_torch(vis1)
    assert native1.shape == (8, 16, 16, 3)
    np.testing.assert_array_equal(layout.visual_to_torch(native1), vis1)

    aud = rng.rand(2, 1, 80, 32).astype(np.float32)
    native_a = layout.audio_from_torch(aud)
    assert native_a.shape == (2, 80, 32, 1)
    np.testing.assert_array_equal(layout.audio_to_torch(native_a), aud)


def test_file_manager(tmp_path):
    p = save_bytes_to_temp(b"hello", suffix=".bin")
    try:
        assert p.read_bytes() == b"hello"
        assert p.suffix == ".bin"
        v, a = split_av_paths(p)
        assert v == a == p
    finally:
        p.unlink()

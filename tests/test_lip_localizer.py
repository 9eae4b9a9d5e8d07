"""Learned lip-localizer tests (preprocessing/lip_localizer.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from lipsync_tpu.preprocessing import lip_localizer as ll
from lipsync_tpu.preprocessing.face_detection import Detection

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture(scope="module")
def params():
    return ll.init_params(np.random.RandomState(0))


def test_forward_numpy_jax_equivalence(params):
    """Training (jax.numpy) and host inference (numpy) share one forward;
    their outputs must agree — otherwise served boxes drift from what was
    trained."""
    import jax
    import jax.numpy as jnp

    x = np.random.RandomState(1).rand(3, ll.PATCH, ll.PATCH, 3).astype(
        np.float32
    )
    out_np = ll.forward(np, params, x)
    with jax.default_matmul_precision("highest"):
        out_jnp = np.asarray(
            ll.forward(jnp, params, jnp.asarray(x))
        )
    assert out_np.shape == (3, 4)
    np.testing.assert_allclose(out_np, out_jnp, rtol=1e-4, atol=1e-5)


def test_conv_downsamples_by_two(params):
    x = np.zeros((2, 16, 16, 3), np.float32)
    y = ll._conv3x3_s2(np, x, params["conv1_w"], params["conv1_b"])
    assert y.shape == (2, 8, 8, 8)


def test_extract_patch_shapes_and_fallback():
    frame = np.random.RandomState(0).randint(
        0, 255, size=(120, 160, 3)
    ).astype(np.uint8)
    patch = ll.extract_patch(frame, (20, 30, 100, 90))
    assert patch.shape == (ll.PATCH, ll.PATCH, 3)
    assert patch.dtype == np.float32
    assert 0.0 <= patch.min() and patch.max() <= 1.0
    # Degenerate box -> no patch (caller keeps the input box).
    assert ll.extract_patch(frame, (5, 5, 9, 8)) is None


def test_norm_box_to_frame_applies_landmark_pad():
    box = (100, 50, 180, 110)  # 80x60 patch box
    out = ll.norm_box_to_frame(
        np.array([0.25, 0.5, 0.75, 1.0]), box, frame_h=240, frame_w=320
    )
    assert out == (100 + 20 - 20, 50 + 30 - 20, 100 + 60 + 20, 50 + 60 + 20)


def test_refine_falls_back_on_degenerate_prediction(params):
    """A localizer emitting junk must return the input box, not a junk
    crop (degradation-ladder contract)."""
    loc = ll.LipLocalizer(params)
    # Force a degenerate output: zero final weights, inverted bias box.
    loc.params["dense2_w"] = np.zeros_like(loc.params["dense2_w"])
    loc.params["dense2_b"] = np.array([0.9, 0.9, 0.1, 0.1], np.float32)
    frame = np.random.RandomState(0).randint(
        0, 255, size=(120, 160, 3)
    ).astype(np.uint8)
    assert loc.refine(frame, (20, 30, 100, 90)) == (20, 30, 100, 90)


def test_learned_backend_wraps_detections(params):
    loc = ll.LipLocalizer(params)

    class Inner:
        name = "stub"
        min_neighbors = 3

        def detect(self, frame):
            return [Detection(bbox=(20, 30, 100, 90), detector="stub")]

    backend = ll.LearnedLipBackend(Inner(), loc)
    assert backend.name == "stub+lipnet"
    assert backend.min_neighbors == 3  # attribute passthrough
    frame = np.random.RandomState(0).randint(
        0, 255, size=(120, 160, 3)
    ).astype(np.uint8)
    dets = backend.detect(frame)
    assert len(dets) == 1
    assert dets[0].detector == "stub+lipnet"
    x1, y1, x2, y2 = dets[0].bbox
    assert 0 <= x1 < x2 <= 160 and 0 <= y1 < y2 <= 120
    # relaxed-retry contract: setting min_neighbors reaches the inner tier
    backend.min_neighbors = 1
    assert backend.inner.min_neighbors == 1


def test_trained_localizer_beats_heuristic_refiner():
    """End-to-end on the agreement eval's UNSEEN renderer: the shipped
    (or smoke) weights must beat the image-evidence refiner and clear the
    r3 VERDICT target (mean >= 0.90, p10 >= 0.75 vs landmark analog)."""
    if not ll.DEFAULT_WEIGHTS.exists():
        pytest.skip("no trained weights checked in")
    import eval_crop_agreement as eca

    report = eca.run(n=60, seed=123)
    learned = report["iou_vs_landmark_analog"]["learned"]
    refined = report["iou_vs_landmark_analog"]["lip_refined"]
    assert learned["mean"] >= 0.90
    assert learned["p10"] >= 0.75
    assert learned["mean"] >= refined["mean"]


def test_default_chain_env_disable(monkeypatch, params, tmp_path):
    """LIPSYNC_LIP_LOCALIZER=0 keeps the learned tier out of the chain."""
    monkeypatch.setenv("LIPSYNC_LIP_LOCALIZER", "0")
    assert ll.load_default_localizer() is None
    monkeypatch.delenv("LIPSYNC_LIP_LOCALIZER")
    # Missing file -> None as well (no crash).
    monkeypatch.setattr(ll, "DEFAULT_WEIGHTS", tmp_path / "nope.npz")
    assert ll.load_default_localizer() is None


def test_training_face_renderer_contract():
    """Training samples: patch in [0,1], target mostly inside the patch."""
    import train_lip_localizer as tll

    rng = np.random.RandomState(3)
    got = 0
    for _ in range(50):
        s = tll.render_training_face(rng)
        if s is None:
            continue
        patch, tgt = s
        got += 1
        assert patch.shape == (ll.PATCH, ll.PATCH, 3)
        assert tgt[0] < tgt[2] and tgt[1] < tgt[3]
        assert -0.2 <= tgt.min() and tgt.max() <= 1.2
    assert got >= 30

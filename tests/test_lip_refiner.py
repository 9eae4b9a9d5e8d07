"""Lip-refinement tier tests (the no-mediapipe landmark-tier analog).

Reference: the FaceMesh tier boxes lips from 21 landmarks ±20 px
(face_detection.py:101-124,428-438); without that wheel, crops come from
the face-box heuristic (:221-234). ``refine_mouth_box`` recovers the
landmark geometry from image evidence; measured agreement lives in
``scripts/eval_crop_agreement.py``.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from lipsync_tpu.preprocessing.face_detection import (
    Detection,
    FakeDetector,
    LipRefinerBackend,
    bbox_iou,
    face_bbox_to_mouth_bbox,
    refine_mouth_box,
)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def face_case(rng):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from eval_crop_agreement import landmark_analog, render_face
    finally:
        sys.path.remove(str(REPO / "scripts"))
    frame, face_box, gt = render_face(
        240, 320, 160, 120, 100, (205, 170, 150), (150, 70, 70),
        openness=0.7, noise=5.0, rng=np.random.RandomState(3),
    )
    fx1, fy1, fx2, fy2 = face_box
    heur = face_bbox_to_mouth_bbox(fx1, fy1, fx2 - fx1, fy2 - fy1, 320, 240)
    target = landmark_analog(gt, 240, 320)
    return frame, heur, target


def test_refine_improves_iou(face_case):
    frame, heur, target = face_case
    refined = refine_mouth_box(frame, heur)
    assert bbox_iou(refined, target) > bbox_iou(heur, target)
    assert bbox_iou(refined, target) > 0.6


def test_refine_agreement_sweep(rng):
    """Aggregate gain on the synthetic sweep: refined must clearly beat the
    heuristic (this is the measured VERDICT deliverable in miniature)."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from eval_crop_agreement import run
    finally:
        sys.path.remove(str(REPO / "scripts"))
    report = run(n=40, seed=7)
    heur = report["iou_vs_landmark_analog"]["heuristic"]["mean"]
    refined = report["iou_vs_landmark_analog"]["lip_refined"]["mean"]
    assert refined > heur + 0.1, report


def test_refine_falls_back_on_flat_region(rng):
    """No lip evidence (uniform skin) -> keep the heuristic box."""
    frame = np.full((240, 320, 3), (205, 170, 150), np.uint8)
    box = (100, 120, 200, 190)
    assert refine_mouth_box(frame, box) == box


def test_refine_falls_back_on_tiny_box(rng):
    frame = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    box = (10, 10, 18, 15)  # < 12 px wide
    assert refine_mouth_box(frame, box) == box


def test_refiner_backend_wraps_and_passes_through(face_case):
    frame, heur, target = face_case

    class _Inner:
        name = "stub"
        min_neighbors = 3

        def __init__(self):
            self.reset_calls = 0

        def reset(self):
            self.reset_calls += 1

        def detect(self, f):
            return [Detection(bbox=heur, detector="stub")]

    inner = _Inner()
    wrapped = LipRefinerBackend(inner)
    assert wrapped.name == "stub+lip"
    # Attribute passthrough both ways (relaxed retry mutates min_neighbors).
    assert wrapped.min_neighbors == 3
    wrapped.min_neighbors = 1
    assert inner.min_neighbors == 1
    wrapped.reset()
    assert inner.reset_calls == 1
    dets = wrapped.detect(frame)
    assert len(dets) == 1
    assert dets[0].detector == "stub+lip"
    assert bbox_iou(dets[0].bbox, target) > bbox_iou(heur, target)


def test_refiner_backend_over_fake_detector(face_case):
    frame, heur, _ = face_case
    wrapped = LipRefinerBackend(FakeDetector(lambda i: [heur]))
    out = wrapped.detect(frame)
    assert len(out) == 1 and out[0].bbox != heur

"""Native Haar evaluator: SIMD/scalar/stump path agreement.

native/haar.cc ships three evaluation paths for the same cascade
contract (reference tier: /root/reference/app/preprocessing/
face_detection.py:236-328): a generic tree walker, a stump-specialized
scalar loop, and an AVX-512 16-window vector loop. The vector path's
per-lane arithmetic is the same op sequence as the scalar stump path, so
detections must be IDENTICAL — any drift is a bug, not noise.
``HAAR_FORCE_SCALAR`` (read per call) selects the scalar path in-process.
"""

import os

import numpy as np
import pytest

from lipsync_tpu.preprocessing.haar import HaarCascade, find_cascade_file


@pytest.fixture(scope="module")
def frontal():
    path = find_cascade_file("haarcascade_frontalface_default.xml")
    if path is None:
        pytest.skip("cascade XMLs not installed")
    return HaarCascade(path)


def _detect(casc, img, force_scalar, **kw):
    old = os.environ.pop("HAAR_FORCE_SCALAR", None)
    try:
        if force_scalar:
            os.environ["HAAR_FORCE_SCALAR"] = "1"
        return np.asarray(casc.detect(img, **kw))
    finally:
        os.environ.pop("HAAR_FORCE_SCALAR", None)
        if old is not None:
            os.environ["HAAR_FORCE_SCALAR"] = old


def test_simd_matches_scalar_on_random_images(frontal):
    rng = np.random.default_rng(0)
    compared = 0
    for _ in range(4):
        h = int(rng.integers(60, 300))
        w = int(rng.integers(60, 500))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        # min_neighbors=0/1 surfaces raw-ish detections (noise fires some
        # windows), exercising the emit path, not just rejections.
        for mn in (0, 1, 3):
            for step in (1, 2):
                simd = _detect(frontal, img, False,
                               min_neighbors=mn, step=step)
                scal = _detect(frontal, img, True,
                               min_neighbors=mn, step=step)
                assert np.array_equal(simd, scal), (h, w, mn, step)
                compared += len(simd)
    # The comparison must have seen real detections to mean anything.
    assert compared > 0


def test_simd_matches_scalar_at_block_remainder_widths(frontal):
    """Widths around the 16-lane block boundary (vector main loop +
    scalar remainder seam)."""
    rng = np.random.default_rng(1)
    for w in (24 + 31, 24 + 32, 24 + 33, 24 + 64, 24 + 15):
        img = rng.integers(0, 256, size=(60, w), dtype=np.uint8)
        for step in (1, 2):
            simd = _detect(frontal, img, False, min_neighbors=0, step=step)
            scal = _detect(frontal, img, True, min_neighbors=0, step=step)
            assert np.array_equal(simd, scal), (w, step)

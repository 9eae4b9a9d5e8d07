"""End-to-end preprocessing pipeline tests with synthetic media and the
scripted fake detector (no MediaPipe, no real datasets)."""

import numpy as np
import pytest

from lipsync_tpu.preprocessing import audio as audio_pp
from lipsync_tpu.preprocessing import video as video_pp
from lipsync_tpu.preprocessing.face_detection import (
    CascadeDetector,
    FakeDetector,
)
from tests.fixtures import synthetic_frames, write_video, write_wav

BOX = (60, 70, 110, 105)


@pytest.fixture(scope="module")
def long_video(tmp_path_factory):
    pytest.importorskip("cv2")
    path = tmp_path_factory.mktemp("media") / "long.mp4"
    return write_video(path, synthetic_frames(n=90), fps=15.0)


def test_detect_and_crop_tracks_shapes():
    frames = synthetic_frames(n=20)
    backend = FakeDetector([[BOX]] * 20)
    tracks = video_pp.detect_and_crop_tracks(frames, backend=backend)
    assert len(tracks) == 1
    tr = tracks[0]
    assert tr.crops.shape == (20, 96, 96, 3)
    assert tr.crops.dtype == np.float32
    assert 0.0 <= tr.crops.min() and tr.crops.max() <= 1.0
    assert tr.stability == 1.0


def test_crops_match_reference_style_cv2(rng):
    """Device crop path == cv2 crop+resize (the reference's _bbox_crop)."""
    cv2 = pytest.importorskip("cv2")
    frames = synthetic_frames(n=4)
    backend = FakeDetector([[BOX]] * 4)
    tr = video_pp.detect_and_crop_tracks(frames, backend=backend)[0]
    x1, y1, x2, y2 = BOX
    for i in range(4):
        ref = cv2.resize(
            frames[i, y1:y2, x1:x2], (96, 96), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32) / 255.0
        assert np.abs(tr.crops[i] - ref).max() < 0.01


def test_preprocess_video_file(long_video):
    clip = video_pp.preprocess_video(
        long_video, backend=FakeDetector(lambda i: [BOX]), max_frames=32
    )
    assert clip.shape == (32, 96, 96, 3)
    assert clip.dtype == np.float32


def test_preprocess_video_no_detection_center_crop(long_video):
    clip = video_pp.preprocess_video(
        long_video, use_face_detection=False, max_frames=32
    )
    assert clip.shape == (32, 96, 96, 3)


def test_preprocess_video_tracks_pads_to_window(long_video):
    out = video_pp.preprocess_video_tracks(
        long_video, backend=FakeDetector(lambda i: [BOX]), max_frames=32
    )
    assert len(out) == 1
    assert out[0]["clip"].shape == (32, 96, 96, 3)
    assert out[0]["total_frames"] >= 85


def test_chunked_track_starts(long_video):
    tracks, fps, total = video_pp.preprocess_video_tracks_chunked(
        long_video, backend=FakeDetector(lambda i: [BOX]),
        chunk_size=32, stride=8,
    )
    assert fps == 15.0
    assert total >= 85
    tr = tracks[0]
    # N ~= 90 frames -> starts 0, 8, ..., <= N-32.
    assert tr.chunk_starts[0] == 0
    assert all(
        b - a == 8 for a, b in zip(tr.chunk_starts, tr.chunk_starts[1:])
    )
    assert tr.chunk_starts[-1] + 32 <= tr.crops.shape[0]
    assert tr.abs_chunk_starts == [
        tr.track_start_frame + s for s in tr.chunk_starts
    ]
    chunk = tr.chunk(1)
    assert chunk.shape == (32, 96, 96, 3)
    np.testing.assert_array_equal(chunk, tr.crops[8:40])


def test_chunked_short_track_single_padded_chunk():
    frames = synthetic_frames(n=40)
    # Track only exists for 12 frames.
    backend = FakeDetector([[BOX]] * 12 + [[]] * 28)
    detections = [backend.detect(f) for f in frames]
    from lipsync_tpu.preprocessing.tracker import track_faces

    h, w = frames.shape[1:3]
    results = track_faces(detections, h, w, max_age=15, min_stability=0.0)
    assert results  # track exists
    # Through the full chunked pipeline with a fresh scripted backend:
    import tempfile, pathlib

    pytest.importorskip("cv2")
    path = pathlib.Path(tempfile.mkdtemp()) / "short.mp4"
    write_video(path, frames, fps=15.0)
    tracks, _, _ = video_pp.preprocess_video_tracks_chunked(
        path, backend=FakeDetector([[BOX]] * 12 + [[]] * 28),
        chunk_size=32, stride=8,
    )
    tr = max(tracks, key=lambda t: t.hits)
    assert tr.chunk_starts == [0]
    assert tr.chunk(0).shape == (32, 96, 96, 3)


def test_cascade_detector_runs_on_noise(rng):
    pytest.importorskip("cv2")
    det = CascadeDetector()
    frame = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    result = det.detect(frame)  # may or may not find "faces" in noise
    assert isinstance(result, list)
    for d in result:
        x1, y1, x2, y2 = d.bbox
        assert 0 <= x1 < x2 <= 160 and 0 <= y1 < y2 <= 120


def test_mediapipe_facedetection_tier_with_stub(monkeypatch):
    """The FaceDetection-bbox middle tier (reference
    face_detection.py:330-385) maps relative face boxes through the
    face->mouth heuristic. mediapipe has no wheel here, so the module is
    stubbed (VERDICT r2 item 8)."""
    import sys
    import types

    from lipsync_tpu.preprocessing.face_detection import (
        MediaPipeFaceDetectionDetector,
        face_bbox_to_mouth_bbox,
    )

    class _Det:
        def __init__(self, xmin, ymin, w, h, score):
            rel = types.SimpleNamespace(xmin=xmin, ymin=ymin,
                                        width=w, height=h)
            self.location_data = types.SimpleNamespace(
                relative_bounding_box=rel
            )
            self.score = [score]

    class _FaceDetection:
        def __init__(self, model_selection, min_detection_confidence):
            assert model_selection == 1
            self.conf = min_detection_confidence

        def process(self, frame):
            return types.SimpleNamespace(detections=[
                _Det(0.25, 0.25, 0.5, 0.5, 0.9),
                _Det(0.0, 0.0, 0.01, 0.01, 0.4),  # degenerate -> dropped
            ])

    mp_stub = types.ModuleType("mediapipe")
    mp_stub.solutions = types.SimpleNamespace(
        face_detection=types.SimpleNamespace(FaceDetection=_FaceDetection)
    )
    monkeypatch.setitem(sys.modules, "mediapipe", mp_stub)

    det = MediaPipeFaceDetectionDetector()
    frame = np.zeros((200, 400, 3), np.uint8)
    found = det.detect(frame)
    assert len(found) == 1
    expected = face_bbox_to_mouth_bbox(100, 50, 200, 100, 400, 200)
    assert found[0].bbox == expected
    assert found[0].detector == "facedetection"
    assert abs(found[0].score - 0.9) < 1e-6


def test_default_chain_includes_facedetection_tier(monkeypatch):
    """With mediapipe importable, get_default_backend builds the full
    4-rung ladder: facemesh -> facedetection -> cascade(+lip)."""
    import sys
    import types

    from lipsync_tpu.preprocessing import face_detection as fd

    class _FaceDetection:
        def __init__(self, **kw):
            pass

    class _FaceMesh:
        def __init__(self, **kw):
            pass

    mp_stub = types.ModuleType("mediapipe")
    mp_stub.solutions = types.SimpleNamespace(
        face_detection=types.SimpleNamespace(FaceDetection=_FaceDetection),
        face_mesh=types.SimpleNamespace(FaceMesh=_FaceMesh),
    )
    monkeypatch.setitem(sys.modules, "mediapipe", mp_stub)
    monkeypatch.setattr(fd, "_default_backend", None)
    try:
        chain = fd.get_default_backend()
        names = [b.name for b in chain.backends]
        assert names[0] == "facemesh"
        assert names[1] == "facedetection"
        assert names[-1].startswith("cascade")
    finally:
        fd._default_backend = None  # don't leak the stubbed chain


def test_preprocess_audio_wav(tmp_path):
    wav = write_wav(tmp_path / "a.wav", seconds=2.0)
    mel = audio_pp.preprocess_audio(wav, target_frames=128)
    assert mel.shape == (80, 128)
    assert mel.dtype == np.float32
    assert mel.max() <= 0.0  # dB ref=max

    mask, dur = audio_pp.detect_voice_activity(wav)
    assert abs(dur - 2.0) < 0.01
    assert mask.dtype == bool and mask.any()


def test_preprocess_audio_empty_raises(long_video):
    with pytest.raises(ValueError, match="Empty audio"):
        audio_pp.preprocess_audio(long_video)  # video has no audio stream


def test_chained_detector_isolates_crashing_tier():
    """A tier raising mid-chain must not kill the frame — the chain falls
    through to the next backend (face_detection.py ChainedDetector;
    reference ladder semantics face_detection.py:387-413 + per-frame crash
    handling :600-619)."""
    from lipsync_tpu.preprocessing.face_detection import ChainedDetector

    class CrashingBackend:
        name = "crashy"
        calls = 0

        def detect(self, frame):
            CrashingBackend.calls += 1
            raise RuntimeError("tier blew up")

    frame = np.zeros((120, 160, 3), np.uint8)
    chain = ChainedDetector([CrashingBackend(), FakeDetector([[BOX]] * 5)])
    out = chain.detect(frame)
    assert CrashingBackend.calls == 1
    assert len(out) == 1 and out[0].detector == "fake"

    # Every tier failing yields an empty frame, not an exception.
    empty = ChainedDetector([CrashingBackend()]).detect(frame)
    assert empty == []

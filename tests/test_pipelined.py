"""Pipelined long-video path: streaming tracker semantics + overlap scoring.

The pipelined path (inference/pipelined.py) must produce the same tracks,
window starts, and probabilities as the batch path — it only changes WHEN
the device work is dispatched (during detection instead of after it).
"""

import numpy as np
import pytest

import jax

from lipsync_tpu.inference.engine import ScoringEngine
from lipsync_tpu.inference.pipelined import score_long_video_pipelined
from lipsync_tpu.inference import policy
from lipsync_tpu.models import LipSyncModel, ModelConfig
from lipsync_tpu.preprocessing.face_detection import Detection, FakeDetector
from lipsync_tpu.preprocessing.tracker import StreamingTracker, track_faces
from lipsync_tpu.preprocessing.video import detect_and_crop_tracks
from tests.fixtures import synthetic_frames

TINY = ModelConfig(video_frames=8, crop_size=32, mel_bins=80, audio_frames=32)
BOX = (60, 70, 110, 105)


@pytest.fixture(scope="module")
def tiny_engine():
    model = LipSyncModel(TINY)
    visual = np.zeros((1, 8, 32, 32, 3), np.float32)
    audio = np.zeros((1, 80, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), visual, audio)
    return ScoringEngine(variables, TINY, use_bfloat16=False)


def _dets(boxes):
    return [Detection(bbox=tuple(b), detector="fake") for b in boxes]


# ── streaming tracker invariants ─────────────────────────────────────────


def test_streaming_matches_batch_tracker():
    """StreamingTracker-driven track_faces == original batch semantics,
    including a miss gap that triggers velocity placeholders + backfill."""
    script = []
    for t in range(40):
        if 12 <= t < 18:
            script.append([])  # 6-frame detector dropout
        else:
            drift = t * 2
            script.append([(50 + drift, 60, 100 + drift, 100)])
    dets = [_dets(s) for s in script]
    results = track_faces(dets, 120, 160, max_age=15)
    assert len(results) == 1
    tr = results[0]
    assert tr.hits == 34
    assert tr.consecutive_miss_max == 6
    assert len(tr.boxes) == 40
    # Backfilled boxes lerp between the pre-gap and post-gap detections.
    pre, post = tr.boxes[11], tr.boxes[18]
    for g, idx in enumerate(range(12, 18)):
        frac = (g + 1) / 7
        expect_x1 = round(pre[0] + (post[0] - pre[0]) * frac)
        assert abs(tr.boxes[idx][0] - expect_x1) <= 1


def test_finalized_prefix_never_mutates():
    """Boxes reported as finalized must be identical to the end-state boxes
    (the pipelined path scores them before tracking finishes)."""
    script = []
    for t in range(60):
        if t % 17 in (5, 6, 7):  # periodic dropouts forcing backfill
            script.append([])
        else:
            script.append([(40 + t, 50, 90 + t, 95)])
    st = StreamingTracker(120, 200, max_age=15)
    snapshots = {}  # track_id -> list of (local_idx, box)
    for t in range(60):
        st.update(_dets(script[t]))
        for state in st.all_states():
            n = st.finalized_length(state)
            snap = snapshots.setdefault(state.track_id, {})
            for i in range(n):
                if i in snap:
                    assert snap[i] == state.boxes[i], (
                        f"finalized slot {i} of track {state.track_id} "
                        f"mutated at frame {t}"
                    )
                else:
                    snap[i] = tuple(state.boxes[i])
    final = {tr.track_id: tr for tr in st.finalize()}
    for tid, snap in snapshots.items():
        if tid not in final:
            continue
        for i, box in snap.items():
            assert tuple(final[tid].boxes[i]) == box


# ── pipelined scoring equivalence ────────────────────────────────────────


def _batch_reference(frames, audio_full, engine, chunk, stride):
    """Batch-path scoring equivalent (what _predict_long_video does with
    score_track_probs)."""
    tracks = detect_and_crop_tracks(
        frames, backend=FakeDetector(lambda i: [BOX]), crop_size=32,
        max_tracks=6,
    )
    out = []
    for tr in tracks:
        n = tr.crops.shape[0]
        starts = [s for s in range(0, max(n - chunk, 0) + 1, stride)
                  if s + chunk <= n] or [0]
        audio_windows = np.stack([
            policy.align_audio_chunk(
                audio_full, tr.track_start_frame + s, len(frames),
                chunk_a_size=TINY.audio_frames, chunk_v_size=chunk,
            )
            for s in starts
        ])
        probs = engine.score_track_probs(tr.crops, starts, audio_windows)
        out.append((starts, [float(p) for p in probs]))
    return out


def test_pipelined_matches_batch(tiny_engine, rng):
    frames = synthetic_frames(n=60)
    audio_full = (rng.rand(80, 400).astype(np.float32) * 60) - 60

    chunked, probs_by_idx = score_long_video_pipelined(
        frames, audio_full, tiny_engine,
        backend=FakeDetector(lambda i: [BOX]),
        chunk_size=8, stride=4, max_tracks=6, crop_size=32,
        audio_frames=TINY.audio_frames,
    )
    ref = _batch_reference(frames, audio_full, tiny_engine, 8, 4)

    assert len(chunked) == len(ref) == 1
    starts_ref, probs_ref = ref[0]
    assert chunked[0].chunk_starts == starts_ref
    assert chunked[0].abs_chunk_starts == [
        chunked[0].track_start_frame + s for s in starts_ref
    ]
    # Same windows scored by the same engine; only the crop resizer differs
    # (host cv2 vs on-device XLA bilinear), both quantized to uint8.
    np.testing.assert_allclose(probs_by_idx[0], probs_ref, atol=0.05)
    assert chunked[0].crops.dtype == np.uint8
    # chunk() normalizes uint8 buffers for the policy functions.
    win = chunked[0].chunk(0)
    assert win.dtype == np.float32 and win.max() <= 1.0


def test_pipelined_short_track_single_window(tiny_engine, rng):
    """A track shorter than one window still yields its padded [0] window
    (batch-path semantics)."""
    frames = synthetic_frames(n=5)
    audio_full = (rng.rand(80, 40).astype(np.float32) * 60) - 60
    chunked, probs = score_long_video_pipelined(
        frames, audio_full, tiny_engine,
        backend=FakeDetector(lambda i: [BOX]),
        chunk_size=8, stride=4, max_tracks=6, crop_size=32,
        audio_frames=TINY.audio_frames,
    )
    assert len(chunked) == 1
    assert chunked[0].chunk_starts == [0]
    assert len(probs[0]) == 1
    assert 0.0 <= probs[0][0] <= 1.0


def test_pipelined_no_detections(tiny_engine, rng):
    frames = synthetic_frames(n=20)
    audio_full = np.zeros((80, 160), np.float32)
    chunked, probs = score_long_video_pipelined(
        frames, audio_full, tiny_engine,
        backend=FakeDetector(lambda i: []),
        chunk_size=8, stride=4, crop_size=32,
        audio_frames=TINY.audio_frames,
    )
    assert chunked == [] and probs == {}


def test_predictor_long_path_pipelined_vs_batch(tiny_engine, tmp_path):
    """Full Predictor long-video run: pipelined on vs off -> same verdict,
    same window grid, near-identical confidence."""
    pytest.importorskip("cv2")
    from lipsync_tpu.inference.predictor import Predictor, PredictorConfig
    from tests.fixtures import write_video

    video = write_video(tmp_path / "long.mp4", synthetic_frames(n=60),
                        fps=15.0)
    results = {}
    for pipelined in (True, False):
        cfg = PredictorConfig(chunk_size=8, chunk_stride=4,
                              pipelined_long_video=pipelined)
        p = Predictor(config=cfg, model_config=TINY, engine=tiny_engine,
                      detector_backend=FakeDetector(lambda i: [BOX]))
        results[pipelined] = p.predict(video)
    on, off = results[True], results[False]
    assert on["verdict"] == off["verdict"]
    assert on["total_chunks_analyzed"] == off["total_chunks_analyzed"]
    on_starts = [w["frame_start"] for w in on["window_results"]]
    off_starts = [w["frame_start"] for w in off["window_results"]]
    assert on_starts == off_starts
    assert on["confidence"] == pytest.approx(off["confidence"], abs=0.05)


def test_pipelined_detection_stride(tiny_engine, rng):
    """Stride 3 on a steady face: detector runs on every 3rd frame only,
    the coasting tracker fills the gaps, and the window grid + scores match
    the per-frame run (identical boxes for a static face)."""
    frames = synthetic_frames(n=42)
    audio_full = (rng.rand(80, 300).astype(np.float32) * 60) - 60
    calls = [0]

    def script(i):
        calls[0] += 1
        return [BOX]

    out = {}
    for stride in (1, 3):
        calls[0] = 0
        chunked, probs = score_long_video_pipelined(
            frames, audio_full, tiny_engine,
            backend=FakeDetector(script),
            chunk_size=8, stride=4, max_tracks=6, crop_size=32,
            audio_frames=TINY.audio_frames,
            detection_stride=stride,
        )
        assert len(chunked) == 1
        out[stride] = (calls[0], chunked[0], probs[0])
    n_calls_1, tr1, p1 = out[1]
    n_calls_3, tr3, p3 = out[3]
    assert n_calls_1 == 42
    assert n_calls_3 == 14  # every 3rd frame only
    assert tr3.chunk_starts == tr1.chunk_starts
    np.testing.assert_array_equal(tr3.crops, tr1.crops)
    np.testing.assert_allclose(p3, p1, atol=1e-6)


def test_pipelined_multi_track(tiny_engine, rng):
    """Two concurrent faces -> two tracks, each fully scored."""
    frames = synthetic_frames(n=40)
    audio_full = (rng.rand(80, 280).astype(np.float32) * 60) - 60
    boxes = [BOX, (10, 10, 50, 45)]
    chunked, probs = score_long_video_pipelined(
        frames, audio_full, tiny_engine,
        backend=FakeDetector(lambda i: list(boxes)),
        chunk_size=8, stride=4, max_tracks=6, crop_size=32,
        audio_frames=TINY.audio_frames,
    )
    assert len(chunked) == 2
    for i, tr in enumerate(chunked):
        expected_windows = [s for s in range(0, 40 - 8 + 1, 4)]
        assert tr.chunk_starts == expected_windows
        assert len(probs[i]) == len(expected_windows)

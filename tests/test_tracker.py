"""Table-driven tests for the face tracker state machine.

The reference has no tests for its tracker (SURVEY.md §4); these encode its
documented behaviors (face_detection.py:668-1101) as golden rules.
"""

import numpy as np

from lipsync_tpu.preprocessing.face_detection import Detection, FakeDetector
from lipsync_tpu.preprocessing.tracker import track_faces

H, W = 240, 320


def dets(*boxes):
    return [Detection(bbox=tuple(b)) for b in boxes]


def test_single_steady_track():
    frames = [dets((100, 100, 150, 140))] * 10
    tracks = track_faces(frames, H, W)
    assert len(tracks) == 1
    tr = tracks[0]
    assert tr.hits == 10
    assert tr.stability == 1.0
    assert len(tr.boxes) == 10
    assert tr.track_start_frame == 0 and tr.track_end_frame == 9


def test_moving_track_followed():
    frames = [dets((100 + 5 * i, 100, 150 + 5 * i, 140)) for i in range(12)]
    tracks = track_faces(frames, H, W)
    assert len(tracks) == 1
    assert tracks[0].hits == 12


def test_grace_period_and_lerp_backfill():
    """Miss 3 frames mid-track: the track survives; after reacquire the
    missed slots hold lerped boxes between the last and new detection."""
    before = (100, 100, 150, 140)
    after = (112, 100, 162, 140)  # small shift so relaxed IoU re-matches
    frames = (
        [dets(before)] * 5 + [dets()] * 3 + [dets(after)] + [dets(after)] * 3
    )
    tracks = track_faces(frames, H, W)
    assert len(tracks) == 1
    tr = tracks[0]
    assert tr.hits == 9  # 5 + 1 + 3
    assert tr.consecutive_miss_max == 3
    # Backfilled slots 5, 6, 7: lerp (g+1)/(gap+1) for g in 0..2.
    for g in range(3):
        t = (g + 1) / 4
        expected_x1 = round(100 + (112 - 100) * t)
        assert tr.boxes[5 + g][0] == expected_x1


def test_track_retired_after_max_age_and_new_track_created():
    a = (50, 50, 100, 90)
    b = (200, 150, 250, 190)
    frames = [dets(a)] * 4 + [dets()] * 20 + [dets(b)] * 4
    tracks = track_faces(frames, H, W, max_age=15, min_stability=0.0)
    ids = sorted(tr.track_id for tr in tracks)
    assert ids == [0, 1]
    by_id = {tr.track_id: tr for tr in tracks}
    assert by_id[0].track_end_frame == 3
    assert by_id[1].track_start_frame == 24
    # Retired track kept its placeholder boxes (4 hits + 16 misses appended
    # before retirement at age > max_age).
    assert len(by_id[0].boxes) == 4 + 16


def test_two_simultaneous_tracks():
    a = (50, 50, 100, 90)
    b = (200, 150, 250, 190)
    frames = [dets(a, b)] * 8
    tracks = track_faces(frames, H, W)
    assert len(tracks) == 2
    assert all(tr.hits == 8 for tr in tracks)


def test_stability_consecutive_miss_penalty():
    """base * (1 - 0.15*(max_consec-1)) for max_consec > 1
    (face_detection.py:1000-1020)."""
    box = (100, 100, 150, 140)
    frames = [dets(box)] * 4 + [dets()] * 3 + [dets(box)] * 5
    tr = track_faces(frames, H, W)[0]
    span = 12
    base = 9 / span
    expected = base * (1 - 0.15 * 2)
    assert abs(tr.stability - expected) < 1e-6


def test_min_stability_filter_and_fallback():
    strong = (50, 50, 100, 90)
    # Weak track: appears every 4th frame at a spot too far to match.
    frames = []
    for i in range(16):
        ds = [strong]
        if i % 4 == 0:
            ds.append((240, 180, 290, 220))
        frames.append(dets(*ds))
    tracks = track_faces(frames, H, W, min_stability=0.35)
    assert all(tr.stability >= 0.35 for tr in tracks)
    assert any(tr.boxes[0] == strong for tr in tracks)

    # All-weak: fallback keeps the best rather than returning nothing.
    weak_frames = [
        dets((240, 180, 290, 220)) if i % 4 == 0 else dets()
        for i in range(16)
    ]
    tracks = track_faces(weak_frames, H, W, min_stability=0.99)
    assert len(tracks) >= 1


def test_max_tracks_cap():
    boxes = [(i * 60, 10, i * 60 + 50, 60) for i in range(5)]
    frames = [dets(*boxes)] * 6
    tracks = track_faces(frames, H, W, max_tracks=3)
    assert len(tracks) == 3


def test_velocity_extrapolation_placeholder():
    """During misses the placeholder follows the smoothed velocity."""
    frames = [dets((100 + 10 * i, 100, 150 + 10 * i, 140)) for i in range(6)]
    frames += [dets()] * 2
    tr = track_faces(frames, H, W, min_stability=0.0)[0]
    # Slot 6 placeholder should be ahead of the last detection.
    assert tr.boxes[6][0] > tr.boxes[5][0]


def test_fake_detector_script():
    det = FakeDetector([[(1, 2, 3, 4)], [], [(5, 6, 7, 8)]])
    frame = np.zeros((10, 10, 3), np.uint8)
    assert det.detect(frame)[0].bbox == (1, 2, 3, 4)
    assert det.detect(frame) == []
    assert det.detect(frame)[0].bbox == (5, 6, 7, 8)
    assert det.detect(frame) == []  # past the script


# ── Detection-stride coasting (tracker.coast) ─────────────────────────────


def run_strided(frames_dets, stride, **kw):
    """Drive a StreamingTracker with detection every `stride` frames."""
    from lipsync_tpu.preprocessing.tracker import StreamingTracker

    st = StreamingTracker(H, W, detection_stride=stride, **kw)
    for i, d in enumerate(frames_dets):
        if i % stride == 0:
            st.update(d)
        else:
            st.coast()
    return st


def test_coast_backfills_to_lerp_of_observations():
    """Linear motion at stride 3: every coasted slot is backfilled to the
    exact lerp between the two surrounding detections, so the track is
    identical to per-frame detection of the same linear trajectory."""
    frames = [dets((100 + 5 * i, 100, 150 + 5 * i, 140)) for i in range(13)]
    st = run_strided(frames, stride=3)
    tracks = st.finalize()
    assert len(tracks) == 1
    tr = tracks[0]
    assert len(tr.boxes) == 13
    for i, b in enumerate(tr.boxes):
        assert b == (100 + 5 * i, 100, 150 + 5 * i, 140), (i, b)


def test_coast_is_stability_neutral():
    """Coasted slots don't count as misses: a steady face detected at
    stride 3 still reads stability 1.0 and zero consecutive misses."""
    frames = [dets((100, 100, 150, 140))] * 12
    st = run_strided(frames, stride=3)
    tr = st.finalize()[0]
    assert tr.stability == 1.0
    assert tr.consecutive_miss_max == 0
    assert tr.hits == 12


def test_coast_tail_extrapolates_with_per_frame_velocity():
    """Trailing coasted slots (no further detection) extend with the
    per-frame velocity estimate, not the raw inter-detection delta."""
    frames = [dets((100 + 4 * i, 100, 150 + 4 * i, 140)) for i in range(13)]
    st = run_strided(frames[:10], stride=3)  # detections at 0,3,6,9
    st.coast()
    st.coast()
    tr = st.finalize()[0]
    assert len(tr.boxes) == 12
    # Velocity converges toward 4 px/frame; the 2 tail slots must move
    # ~4 px each, not ~12 (the un-normalized stride delta).
    x_last_det = tr.boxes[9][0]
    for k, slot in enumerate((10, 11)):
        drift = tr.boxes[slot][0] - x_last_det
        assert 2 * (k + 1) <= drift <= 6 * (k + 1), (slot, drift)


def test_coast_miss_interaction_retires_after_max_age_misses():
    """Misses at detection frames still age the track; coasted slots do
    not. max_age=2 with stride 2: 3 consecutive missed detections retire."""
    a = (50, 50, 100, 90)
    frames = [dets(a)] * 4 + [dets()] * 8
    st = run_strided(frames, stride=2, max_age=2)
    tr = st.finalize()[0]
    assert tr.consecutive_miss_max == 3
    assert len(st.completed) == 1


def test_stride_one_path_unchanged():
    """detection_stride=1 with no coast() calls reproduces the original
    per-frame behavior bit-for-bit (regression guard on the refactor)."""
    before = (100, 100, 150, 140)
    after = (112, 100, 162, 140)
    frames = (
        [dets(before)] * 5 + [dets()] * 3 + [dets(after)] * 4
    )
    tracks = track_faces(frames, H, W)
    tr = tracks[0]
    assert tr.hits == 9
    assert tr.consecutive_miss_max == 3
    for g in range(3):
        t = (g + 1) / 4
        assert tr.boxes[5 + g][0] == round(100 + (112 - 100) * t)


def test_coast_does_not_mask_miss_streaks():
    """Coasted slots during a real miss streak count AGAINST stability:
    a face visible on half the detection attempts at stride 3 must read
    ~0.5 stability (stride-1 semantics), not ~0.83 (ghost-track
    inflation). Regression for the round-2 review finding."""
    a = (100, 100, 150, 140)
    frames = []  # detection attempts alternate hit/miss, 2 coasts between
    for det_i in range(8):
        frames.append(dets(a) if det_i % 2 == 0 else dets())
        frames += [None, None]
    from lipsync_tpu.preprocessing.tracker import StreamingTracker

    st = StreamingTracker(H, W, detection_stride=3, max_age=10)
    for f in frames:
        if f is None:
            st.coast()
        else:
            st.update(f)
    tr = st.tracks[0]
    stab = st.stability(tr)
    # 4 hits + 8 matched-state coasts over a ~22-slot span ≈ 0.5; the
    # pre-fix behavior counted every coast as a hit (≈ 0.83).
    assert stab < 0.65, stab
    assert tr.hits <= 12


def test_finalized_length_with_stride():
    """At stride 3 the immutable prefix lags (max_age+1)*3-1 slots."""
    from lipsync_tpu.preprocessing.tracker import StreamingTracker

    st = StreamingTracker(H, W, max_age=2, detection_stride=3)
    for i in range(20):
        if i % 3 == 0:
            st.update(dets((100, 100, 150, 140)))
        else:
            st.coast()
    tr = st.tracks[0]
    window = (2 + 1) * 3 - 1  # 8
    assert st.finalized_length(tr) == 20 - window
    assert st.finalized_length(tr, done=True) == 20

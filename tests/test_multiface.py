"""Multi-face scene generation + production-replay integration tests.

The reference's marquee multi-subject path (predictor.py:1538-1631 +
face_detection.py:668-1101) is exercised here end-to-end on synthetic
2-face scenes with ground-truth roles: REAL Haar detection + tracker +
the full Predictor orchestration (model forwards stubbed so the test is
CPU-cheap — model quality is measured separately by
scripts/eval_multiface.py on trained weights)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import eval_multiface  # noqa: E402
import make_synthetic_dataset as msd  # noqa: E402


SR = 16000


# ── Scene construction invariants (no I/O) ────────────────────────────────


@pytest.mark.parametrize("scene", msd.MULTIFACE_SCENES)
def test_build_scene_roles_and_label(scene):
    rng = np.random.RandomState(0)
    faces, pcm = msd.build_multiface_scene(scene, 2, 4.0, SR, rng)
    roles = [f["role"] for f in faces]
    assert len(faces) == 2
    assert pcm.shape == (4 * SR,)
    dubbed = roles.count("speaker_dubbed")
    assert (dubbed > 0) == any(
        f["role"] == "speaker_dubbed" for f in faces
    )
    if scene == "all_real":
        assert roles == ["speaker_synced", "listener"]
    elif scene == "all_fake":
        assert roles == ["speaker_dubbed", "listener"]
    elif scene == "mixed":
        assert sorted(roles) == ["speaker_dubbed", "speaker_synced"]
    elif scene == "turn_taking":
        assert roles == ["speaker_synced", "speaker_synced"]
    else:  # turn_taking_dub
        assert roles == ["speaker_synced", "speaker_dubbed"]
    # Listeners never claim a speaking span; speakers claim exactly one.
    for f in faces:
        assert len(f["speaking"]) == (0 if f["role"] == "listener" else 1)


def test_turn_taking_audio_respects_spans():
    """Each speaker's audio lives inside its half of the clip."""
    rng = np.random.RandomState(1)
    faces, pcm = msd.build_multiface_scene("turn_taking", 2, 4.0, SR, rng)
    (a0, b0), = faces[0]["speaking"]
    (a1, b1), = faces[1]["speaking"]
    assert b0 <= a1  # non-overlapping turns
    # RMS inside speaking spans dwarfs the between-turns gap.
    gap = pcm[int(b0 * SR):int(a1 * SR)]
    talk = pcm[int(a0 * SR):int(b0 * SR)]
    assert np.sqrt(np.mean(talk**2)) > 10 * np.sqrt(np.mean(gap**2))


def test_dubbed_face_mouth_mismatches_audio():
    """The dubbed face's openness must NOT track the audio envelope the
    way the synced face's does (that's the manipulation)."""
    rng = np.random.RandomState(2)
    faces, pcm = msd.build_multiface_scene("mixed", 2, 4.0, SR, rng)
    synced = next(f for f in faces if f["role"] == "speaker_synced")
    dubbed = next(f for f in faces if f["role"] == "speaker_dubbed")
    k = SR // 50
    env = np.abs(pcm)[: len(pcm) // k * k].reshape(-1, k).mean(axis=1)

    def corr(face):
        o = face["openness"][: len(pcm) // k * k].reshape(-1, k).mean(axis=1)
        return float(np.corrcoef(o, env)[0, 1])

    # Openness is vowel-shaped, not an amplitude copy, so the synced
    # correlation is moderate — the separation from dubbed is the signal.
    assert corr(synced) > corr(dubbed) + 0.2
    assert corr(synced) > 0.2


# ── Ground-truth derivation helpers (eval_multiface) ──────────────────────


def test_expected_case_and_policies():
    truth = {
        "faces": [
            {"slot": 0, "role": "speaker_synced", "speaking": [[0.0, 2.0]]},
            {"slot": 1, "role": "speaker_dubbed", "speaking": [[2.5, 4.0]]},
            {"slot": 2, "role": "listener", "speaking": []},
        ]
    }
    assert eval_multiface.expected_case(truth) == "mixed_real_and_fake"
    pol = eval_multiface.expected_policy_verdicts(truth)
    assert pol["any_speaking_fake_policy_is_fake"] is True
    assert pol["all_speaking_fake_policy_is_fake"] is False
    assert pol["majority_speaking_fake_policy_is_fake"] is False
    assert pol["active_speaker_policy_is_fake"] is None  # two speakers
    assert eval_multiface.speaking_face_at(truth, 1.0) == 0
    assert eval_multiface.speaking_face_at(truth, 3.0) == 1
    assert eval_multiface.speaking_face_at(truth, 2.2) is None


def test_match_tracks_to_faces_and_primary():
    truth = {
        "frame_width": 340,
        "n_faces": 2,
        "faces": [{"slot": 0, "cx": 85.0}, {"slot": 1, "cx": 255.0}],
    }
    tracks = [
        {"track_id": 0, "bbox": [60, 80, 110, 110], "hits": 100},
        {"track_id": 1, "bbox": [230, 80, 280, 110], "hits": 90},
        {"track_id": 2, "bbox": [70, 80, 100, 110], "hits": 5},
        {"track_id": 3, "bbox": [0, 0, 2, 2], "hits": 50},  # spurious
    ]
    assignment = eval_multiface.match_tracks_to_faces(tracks, truth)
    assert assignment == {0: 0, 1: 1, 2: 0, 3: None}
    primary = eval_multiface.primary_track_per_face(tracks, assignment)
    assert primary[0]["track_id"] == 0  # most hits wins the slot
    assert primary[1]["track_id"] == 1


# ── Integration: real Haar detection over a rendered 2-face scene ─────────


@pytest.fixture(scope="module")
def multiface_clip(tmp_path_factory):
    out = tmp_path_factory.mktemp("mf")
    rng = np.random.RandomState(7)
    msd.write_multiface_scene(out, 0, "mixed", 2, 4.0, 15.0, SR, rng)
    clip = out / "mixed_0000.avi"
    truth = json.loads(clip.with_suffix(".json").read_text())
    return clip, truth


def test_haar_recovers_both_faces(multiface_clip):
    """Real cascade detection + tracker resolve the two rendered subjects
    into tracks whose mean boxes sit in the correct horizontal cells."""
    clip, truth = multiface_clip
    from lipsync_tpu.preprocessing.video import (
        preprocess_video_tracks_chunked,
    )

    tracks, fps, total = preprocess_video_tracks_chunked(clip)
    assert len(tracks) >= 2
    cell_w = truth["frame_width"] / truth["n_faces"]
    slots_hit = set()
    for tr in tracks:
        cx = (tr.mean_bbox[0] + tr.mean_bbox[2]) / 2.0
        for f in truth["faces"]:
            if abs(cx - f["cx"]) < cell_w / 2:
                slots_hit.add(f["slot"])
    assert slots_hit == {0, 1}


def test_predictor_end_to_end_multiface(multiface_clip):
    """Full production orchestration over the 2-face clip: real Haar +
    tracker, scripted scorer. The response must carry per-track bboxes
    that attribute both subjects, plus the multi-face policy surface."""
    clip, truth = multiface_clip
    from tests.test_predictor import StubEngine, _make_predictor

    engine = StubEngine()  # P(REAL) from mean pixel value
    p = _make_predictor(engine)  # chunk_size=8 -> long path at 60 frames
    res = p.predict(clip)

    assert res["verdict"] in ("real", "fake", "uncertain")
    assert res["tracks"], "multi-face clip must produce tracks"
    for tr in res["tracks"]:
        assert len(tr["bbox"]) == 4
    assignment = eval_multiface.match_tracks_to_faces(res["tracks"], truth)
    primary = eval_multiface.primary_track_per_face(
        res["tracks"], assignment
    )
    assert set(primary) == {0, 1}, "both subjects attributable by bbox"
    assert res["speaker_case"] in (
        "all_speaking_real", "all_speaking_fake", "mixed_real_and_fake",
        "mixed_window_consensus_uncertain", "uncertain_override_sparse_real",
        "uncertain_override_mouth_motion",
    )
    assert set(res["verdicts"]) == {
        "active_speaker_policy_is_fake",
        "any_speaking_fake_policy_is_fake",
        "all_speaking_fake_policy_is_fake",
        "majority_speaking_fake_policy_is_fake",
    }
    assert res["window_results"], "long path must emit window results"
    row = eval_multiface.evaluate_clip(p, clip, truth)
    assert row["faces_recovered"] == 2
    assert row["speaker_case_gt"] == "mixed_real_and_fake"


def test_predictor_multiface_articulation_mode(multiface_clip):
    """speaking_score_mode='articulation' end to end over the 2-face
    scene: the DUBBED speaker must register as articulating (>= the 0.50
    policy threshold) and the silent listener must not — the separation
    the reference's correlation scorer cannot make
    (BENCHMARKS.md 'Multi-face production replay')."""
    clip, truth = multiface_clip
    from lipsync_tpu.inference.predictor import PredictorConfig
    from tests.test_predictor import StubEngine, _make_predictor

    cfg = PredictorConfig(
        chunk_size=8, chunk_stride=4, speaking_score_mode="articulation"
    )
    p = _make_predictor(StubEngine(), tmp_cfg=cfg)
    res = p.predict(clip)
    assignment = eval_multiface.match_tracks_to_faces(res["tracks"], truth)
    primary = eval_multiface.primary_track_per_face(res["tracks"], assignment)
    assert set(primary) == {0, 1}
    role = {f["slot"]: f["role"] for f in truth["faces"]}
    for slot, tr in primary.items():
        act = float(tr["speaking_activity"])
        if role[slot] == "listener":
            assert act < 0.50, f"listener slot {slot} activity {act}"
        else:
            assert act >= 0.50, f"{role[slot]} slot {slot} activity {act}"
    # Articulation mode activates turn-aware aggregation (auto): the
    # response must carry the per-segment verdict surface.
    assert "turn_aware_decided" in res
    if res["window_results"]:
        assert res["segment_verdicts"], "articulation mode emits segments"
        for seg in res["segment_verdicts"]:
            assert {"track_id", "confidence", "is_fake", "n_windows",
                    "decided"} <= set(seg)

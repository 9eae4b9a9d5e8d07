"""Golden + table-driven tests for the aggregation/guard policy layer.

Where possible, outputs are compared against the REFERENCE Predictor's own
methods (imported with stubbed deps); guard-cascade scenarios are
table-driven from the documented semantics (predictor.py:856-1155).
"""

import numpy as np
import pytest

from lipsync_tpu.inference import policy
from tests.reference_stubs import make_reference_policy_holder


@pytest.fixture(scope="module")
def ref():
    try:
        return make_reference_policy_holder()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")


# ── Golden comparisons against the reference implementation ───────────────


def test_robust_confidence_golden(ref, rng):
    for smoothing in ("none", "median", "trimmed_mean"):
        ref.confidence_smoothing = smoothing
        for n in (0, 1, 3, 10, 37):
            confs = list(rng.rand(n).astype(float))
            ours = policy.robust_confidence(confs, smoothing, 0.1)
            theirs = ref._robust_confidence(confs)
            assert abs(ours - theirs) < 1e-6, (smoothing, n)
    ref.confidence_smoothing = "median"


def test_speech_weighted_confidence_golden(ref, rng):
    for n in (1, 5, 20):
        confs = list(rng.rand(n).astype(float))
        speak = list(rng.rand(n).astype(float))
        vad = list(rng.rand(n).astype(float))
        for v in (None, vad):
            ours = policy.speech_weighted_confidence(confs, speak, v)
            theirs = ref._speech_weighted_confidence(confs, speak, v)
            assert abs(ours - theirs) < 1e-6


def test_speaking_alignment_score_golden(ref, rng):
    visual = rng.rand(16, 24, 24, 3).astype(np.float32)
    audio = (rng.rand(80, 64).astype(np.float32) * 60) - 60
    ours = policy.speaking_alignment_score(visual, audio)
    theirs = ref._speaking_alignment_score(
        np.transpose(visual, (3, 0, 1, 2)), audio[None]
    )
    assert abs(ours - theirs) < 1e-5


def _talking_and_still_crops(rng, t=32, s=48):
    """A crop whose mouth half oscillates vs one with sensor jitter only."""
    base = rng.rand(s, s, 3).astype(np.float32)
    talking = np.repeat(base[None], t, axis=0)
    for i in range(t):
        # Mouth opens/closes: a dark bar whose height swings with i
        # (amplitude sized so the motion/contrast ratio lands in the
        # measured speaker band 0.12-0.25, not at the 0.10 midpoint).
        h = int((s // 5) * (1 + np.sin(i * 0.9)))
        talking[i, s - s // 5 - h : s - s // 5, s // 4 : 3 * s // 4, :] = 0.05
    still = np.repeat(base[None], t, axis=0)
    still += rng.randn(t, s, s, 3).astype(np.float32) * 0.002
    return talking, still


def test_speaking_articulation_score_separates_talking_from_still(rng):
    talking, still = _talking_and_still_crops(rng)
    talk_score = policy.speaking_articulation_score(talking)
    still_score = policy.speaking_articulation_score(still)
    assert talk_score > 0.7
    assert still_score < 0.3
    # Scale/bit-depth invariance: uint8-range input scores the same.
    talk_255 = policy.speaking_articulation_score(talking * 255.0)
    assert abs(talk_255 - talk_score) < 1e-4
    # Degenerate inputs return the neutral 0.5.
    assert policy.speaking_articulation_score(talking[:1]) == 0.5


def test_speaking_score_mode_dispatch(rng):
    """alignment == reference scorer; articulation stays high for a DUBBED
    face (articulating mouth, uncorrelated audio) where alignment cannot
    (the round-4 multiface failure mode, docs/eval/multiface_2f_r4.json)."""
    talking, still = _talking_and_still_crops(rng)
    audio = (rng.rand(80, 64).astype(np.float32) * 60) - 60  # uncorrelated
    assert policy.speaking_score(talking, audio, "alignment") == (
        policy.speaking_alignment_score(talking, audio)
    )
    dubbed = policy.speaking_score(talking, audio, "articulation")
    listener = policy.speaking_score(still, audio, "articulation")
    assert dubbed > 0.55      # counted as a speaking track
    assert listener < 0.50    # excluded from speaker policies


def test_predictor_config_validates_speaking_mode():
    from lipsync_tpu.inference.predictor import PredictorConfig

    assert PredictorConfig(speaking_score_mode="bogus").speaking_score_mode \
        == "alignment"
    assert PredictorConfig(
        speaking_score_mode="articulation"
    ).speaking_score_mode == "articulation"


def test_mouth_motion_energy_check_golden(ref, rng):
    cases = [
        (rng.rand(8, 32, 32, 3).astype(np.float32),
         rng.rand(80, 32).astype(np.float32) * 30 - 30),  # loud, moving
        (np.full((8, 32, 32, 3), 0.5, np.float32),
         rng.rand(80, 32).astype(np.float32) * 5 - 10),   # loud, still
        (np.full((8, 32, 32, 3), 0.5, np.float32),
         np.full((80, 32), -70.0, np.float32)),           # silent, still
    ]
    for visual, audio in cases:
        ours = policy.mouth_motion_energy_check(visual, audio)
        theirs = ref._mouth_motion_energy_check(
            np.transpose(visual, (3, 0, 1, 2)), audio[None]
        )
        assert ours["check_result"] == theirs["check_result"]
        assert abs(ours["audio_energy"] - theirs["audio_energy"]) < 1e-3
        assert (
            abs(ours["mouth_motion_energy"] - theirs["mouth_motion_energy"])
            < 1e-5
        )


def test_align_audio_chunk_reference_slice_golden(ref, rng):
    """reference_slice=True reproduces the reference's SERVING alignment
    bit-for-bit (predictor.py:525-552) — kept for A/B measurement."""
    full = rng.rand(80, 300).astype(np.float32)
    full_t = full[None]  # (1, 80, 300)
    for v_start, total_v in [(0, 100), (40, 100), (95, 100), (0, 10)]:
        ours = policy.align_audio_chunk(
            full, v_start, total_v, 128, reference_slice=True
        )
        theirs = ref._align_audio_chunk(full_t, v_start, total_v, 128)
        np.testing.assert_allclose(ours, theirs[0], atol=1e-6)
        assert ours.shape == (80, 128)


def test_align_audio_chunk_matches_training_contract(rng):
    """DEFAULT alignment = the training loader's formula (reference
    dataset.py:428-446): slice the mel span covering the visual window
    exactly, then integer-linspace resample to audio_frames. The
    reference's serving path instead slices 128 RAW columns — only 60%
    of the window at an untrained time scale (its own train/serve
    mismatch, predictor.py:525-552) — which this rebuild does not
    inherit."""
    full = rng.rand(80, 1000).astype(np.float32)  # 10 s @ 100 Hz
    total_v = 150  # 10 s @ 15 fps
    for v_start in (0, 40, 118):
        ours = policy.align_audio_chunk(full, v_start, total_v, 128)
        # Training formula (training/data.py:148-159).
        a_ratio = 1000 / total_v
        mel_len = int(round(32 * a_ratio))
        a_start = int(round(v_start * a_ratio))
        want = full[:, a_start: a_start + mel_len]
        if want.shape[1] < mel_len:
            pad = np.repeat(
                want[:, -1:], mel_len - want.shape[1], axis=1
            )
            want = np.concatenate([want, pad], axis=1)
        idx = np.linspace(0, want.shape[1] - 1, 128).astype(np.int64)
        np.testing.assert_allclose(ours, want[:, idx], atol=1e-6)
        assert ours.shape == (80, 128)


# ── Guard cascade scenarios (table-driven) ────────────────────────────────


def _guards(confs, speak=None, vad=None, **kw):
    confs = np.asarray(confs, np.float32)
    if speak is None:
        speak = np.full_like(confs, 0.8)
    return policy.run_guard_cascade(
        policy.GuardInputs(
            window_confs=confs,
            window_speaking=np.asarray(speak, np.float32),
            window_vad=None if vad is None else np.asarray(vad, np.float32),
            **kw,
        )
    )


def test_all_real_windows_pass_clean():
    out = _guards([0.9] * 12)
    assert out.final_is_real and out.override_reason is None
    assert not out.meaningful_fake_evidence
    assert out.fake_vote_ratio < 0.05


def test_temporal_minority_fake_gate_fires():
    """20% of windows strongly fake -> forced FAKE (predictor.py:985-1020).

    Real windows sit at 0.55 (below the strong-real 0.65 bar) so the
    mixed-consensus override cannot lift the verdict afterwards."""
    confs = [0.55] * 40 + [0.05] * 10
    out = _guards(confs)
    assert out.meaningful_fake_evidence
    assert not out.mixed_window_signal
    assert not out.final_is_real
    assert out.final_confidence < 0.5


def test_minority_gate_needs_min_windows():
    """2 fake windows < fake_vote_min_windows floor -> stays real."""
    confs = [0.9] * 40 + [0.05] * 2
    out = _guards(confs)
    assert not out.meaningful_fake_evidence
    assert out.final_is_real


def test_strict_fake_requires_consecutive_run():
    # High fake ratio + 8-consecutive run -> strict evidence.
    confs = [0.1] * 20 + [0.9] * 2
    out = _guards(confs)
    assert out.strict_fake_evidence
    # Same ratio but scattered (max run < 8) -> not strict.
    confs2 = ([0.1] * 7 + [0.9]) * 3
    out2 = _guards(confs2)
    assert not out2.strict_fake_evidence


def test_mixed_consensus_conservative_override():
    """Strong real + strong fake mix without strict evidence lifts to
    uncertain-real (predictor.py:1022-1033)."""
    confs = [0.9, 0.85, 0.1, 0.05, 0.9, 0.08, 0.88, 0.07, 0.06]
    out = _guards(confs)
    if not out.final_is_real:
        pytest.skip("gate produced confident fake; scenario needs mix")
    if out.window_consensus_uncertain:
        assert out.override_reason == "window_consensus_mixed"
        assert out.final_confidence >= 0.5


def test_sparse_real_guard():
    """Very low overall confidence + one strong-real window -> uncertain
    (predictor.py:1076-1105). Scenario must avoid the minority gate's
    strong_fake floor? No — gate fires first and forces low conf; then the
    sparse guard lifts it when max window >= 0.30 and conf < 0.08."""
    confs = [0.01] * 30 + [0.45]
    out = _guards(confs)
    assert out.sparse_real_guard_applied
    assert out.override_reason == "sparse_real_signal"
    assert out.final_confidence == 0.5
    assert out.final_is_real


def test_temporal_drift_detection():
    confs = [0.9] * 10 + [0.4] * 10
    out = _guards(confs)
    assert out.temporal_confidence_drop
    assert out.temporal_drift >= 0.2
    out2 = _guards([0.9] * 20)
    assert not out2.temporal_confidence_drop


def test_guard_cascade_order_minority_before_mixed():
    """The minority gate caps confidence below threshold BEFORE the mixed
    override can lift it — order is behavior."""
    confs = [0.9] * 10 + [0.05] * 6
    out = _guards(confs)
    assert out.meaningful_fake_evidence
    # strict evidence false (run of 6 < 8) and mixed signal true ->
    # conservative override lifts back to uncertain-real.
    assert not out.strict_fake_evidence
    assert out.mixed_window_signal
    assert out.window_consensus_uncertain
    assert out.final_is_real
    assert out.override_reason == "window_consensus_mixed"


# ── Timeline + misc ───────────────────────────────────────────────────────


def test_compress_speaker_timeline():
    windows = [
        {"selected_track_id": 0, "frame_start": 0, "frame_end": 32},
        {"selected_track_id": 0, "frame_start": 8, "frame_end": 40},
        {"selected_track_id": 1, "frame_start": 16, "frame_end": 48},
        {"selected_track_id": 1, "frame_start": 24, "frame_end": 56},
        {"selected_track_id": 0, "frame_start": 64, "frame_end": 96},
    ]
    timeline = policy.compress_speaker_timeline(windows, with_time=False)
    assert [seg["selected_track_id"] for seg in timeline] == [0, 1, 0]
    assert timeline[0] == {
        "selected_track_id": 0, "frame_start": 0, "frame_end": 40,
    }


def test_window_vad_coverage():
    mask = np.array([1] * 100 + [0] * 100, bool)
    assert policy.window_vad_coverage(mask, 0.0, 1.0) == 1.0
    assert policy.window_vad_coverage(mask, 1.0, 2.0) == 0.0
    assert abs(policy.window_vad_coverage(mask, 0.5, 1.5) - 0.5) < 0.02


def test_sample_check_indices():
    assert policy.sample_check_indices(3) == [0, 1, 2]
    idx = policy.sample_check_indices(50)
    assert len(idx) == 5 and idx[-1] == 49 and idx[0] == 0


def test_speaker_policies():
    tracks = [
        {"speaking_activity": 0.9, "stability": 0.8, "is_fake": False},
        {"speaking_activity": 0.8, "stability": 0.7, "is_fake": True},
        {"speaking_activity": 0.1, "stability": 0.9, "is_fake": True},
    ]
    case, count, real, fake, verdicts = policy.speaker_policies(
        tracks, best_is_fake=False
    )
    assert case == "mixed_real_and_fake"
    assert count == 2 and real == 1 and fake == 1
    assert verdicts["any_speaking_fake_policy_is_fake"]
    assert not verdicts["all_speaking_fake_policy_is_fake"]
    assert not verdicts["majority_speaking_fake_policy_is_fake"]


# ── Turn-aware aggregation (TPU-rebuild improvement, round 5) ─────────────


def test_mixed_consensus_is_per_track_when_ids_given():
    """Alternating strong-real/strong-fake windows: the reference's global
    counting (predictor.py:1022-1033) reads this as mixed evidence; with
    track ids it is two subjects taking turns — only a SINGLE track showing
    both signals is genuinely mixed."""
    confs = [0.9, 0.05, 0.9, 0.05, 0.9, 0.05, 0.9, 0.05]
    out = _guards(confs)
    assert out.mixed_window_signal  # parity default unchanged
    out2 = _guards(
        confs, window_track_ids=np.asarray([1, 2, 1, 2, 1, 2, 1, 2])
    )
    assert not out2.mixed_window_signal
    assert out2.strong_real == 4 and out2.strong_fake == 4  # still reported
    out3 = _guards(confs, window_track_ids=np.ones(8, dtype=np.int64))
    assert out3.mixed_window_signal  # one subject, genuinely mixed


def _win(tid, conf, start, speaking=0.8):
    return {
        "selected_track_id": tid,
        "confidence": conf,
        "frame_start": start,
        "frame_end": start + 32,
        "speaking_activity": speaking,
    }


def test_turn_aware_segments_any_fake_turn_is_fake():
    wins = (
        [_win(1, 0.9, s) for s in range(0, 64, 8)]  # real speaker's turn
        + [_win(2, 0.05, s) for s in range(64, 128, 8)]  # dubbed turn
        + [_win(1, 0.88, s) for s in range(128, 192, 8)]  # real again
    )
    segs = policy.turn_aware_segment_verdicts(wins)
    assert [s["track_id"] for s in segs] == [1, 2, 1]
    assert [s["is_fake"] for s in segs] == [False, True, False]
    assert all(s["decided"] for s in segs)
    assert segs[1]["frame_start"] == 64 and segs[1]["frame_end"] == 152
    conf, is_real = policy.aggregate_segment_verdicts(segs)
    assert not is_real and conf < 0.5


def test_turn_aware_segments_all_real():
    wins = [_win(1, 0.9, s) for s in range(0, 64, 8)] + [
        _win(2, 0.8, s) for s in range(64, 128, 8)
    ]
    segs = policy.turn_aware_segment_verdicts(wins)
    conf, is_real = policy.aggregate_segment_verdicts(segs)
    assert is_real and conf >= 0.5


def test_turn_aware_undecided_segments_fall_back():
    """One-window winner flips are attribution noise and silent spans carry
    no sync evidence: neither decides, the caller keeps the cascade result."""
    wins = [_win(1, 0.05, 0, speaking=0.2), _win(2, 0.9, 8)]
    segs = policy.turn_aware_segment_verdicts(wins)
    assert not any(s["decided"] for s in segs)
    assert policy.aggregate_segment_verdicts(segs) is None


def test_turn_aware_silent_fake_span_does_not_decide():
    """A fake-reading but silent segment must not drive the clip fake."""
    wins = [_win(1, 0.9, s) for s in range(0, 64, 8)] + [
        _win(2, 0.1, s, speaking=0.2) for s in range(64, 128, 8)
    ]
    segs = policy.turn_aware_segment_verdicts(wins)
    conf, is_real = policy.aggregate_segment_verdicts(segs)
    assert is_real  # only the real speaking turn decides

"""Predictor orchestration + scoring engine tests.

The engine is exercised with a real (small) model; the Predictor's
short/long orchestration is exercised end-to-end on synthetic video files
with a deterministic stubbed scorer, which makes the decision paths
(refinement, window winners, guards, mouth-motion overrides) testable
without compiling the full-size model on one CPU core.
"""

from pathlib import Path

import numpy as np
import pytest

import jax

from lipsync_tpu.inference.calibration import Calibrator
from lipsync_tpu.inference.engine import ScoringEngine
from lipsync_tpu.inference.predictor import Predictor, PredictorConfig
from lipsync_tpu.models import LipSyncModel, ModelConfig
from lipsync_tpu.preprocessing.face_detection import FakeDetector
from tests.fixtures import synthetic_frames, write_video

TINY = ModelConfig(video_frames=8, crop_size=32, mel_bins=80, audio_frames=32)
BOX = (60, 70, 110, 105)


@pytest.fixture(scope="module")
def tiny_engine():
    model = LipSyncModel(TINY)
    visual = np.zeros((1, 8, 32, 32, 3), np.float32)
    audio = np.zeros((1, 80, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), visual, audio)
    return ScoringEngine(variables, TINY, use_bfloat16=False)


def test_engine_batch_consistency(tiny_engine, rng):
    v = rng.rand(5, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(5, 80, 32).astype(np.float32) * 60) - 60
    batch = tiny_engine.score_probs(v, a)
    assert batch.shape == (5,)
    singles = [
        tiny_engine.score_probs(v[i : i + 1], a[i : i + 1])[0]
        for i in range(5)
    ]
    np.testing.assert_allclose(batch, singles, atol=2e-5)
    assert np.all((batch >= 0) & (batch <= 1))


def test_engine_double_buffered_streaming_matches_serialized(rng):
    """score_logits with max_in_flight=2 over several max_batch groups
    (incl. a ragged tail) equals the serialized max_in_flight=1 run and a
    one-shot large-batch engine (round-3 double-buffer path)."""
    model = LipSyncModel(TINY)
    visual = np.zeros((1, 8, 32, 32, 3), np.float32)
    audio = np.zeros((1, 80, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), visual, audio)
    v = rng.rand(11, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(11, 80, 32).astype(np.float32) * 60) - 60

    buffered = ScoringEngine(
        variables, TINY, use_bfloat16=False, max_batch=4, max_in_flight=2
    )
    serialized = ScoringEngine(
        variables, TINY, use_bfloat16=False, max_batch=4, max_in_flight=1
    )
    wide = ScoringEngine(variables, TINY, use_bfloat16=False, max_batch=16)
    lb = buffered.score_logits(v, a)
    ls = serialized.score_logits(v, a)
    lw = wide.score_logits(v, a)
    assert lb.shape == (11,)
    np.testing.assert_allclose(lb, ls, atol=1e-6)
    np.testing.assert_allclose(lb, lw, atol=2e-5)

    # Track path: 9 windows over max_batch=4 -> 3 pipelined groups.
    crops = rng.randint(0, 255, (16, 32, 32, 3)).astype(np.uint8)
    starts = list(range(9))
    aw = (rng.rand(9, 80, 32).astype(np.float32) * 60) - 60
    tb = buffered.score_track_logits(crops, starts, aw)
    ts = serialized.score_track_logits(crops, starts, aw)
    assert tb.shape == (9,)
    np.testing.assert_allclose(tb, ts, atol=1e-6)


def test_engine_calibration_applied(tiny_engine, rng):
    v = rng.rand(2, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(2, 80, 32).astype(np.float32) * 60) - 60
    logits = tiny_engine.score_logits(v, a)
    tiny_engine.calibrator = Calibrator(method="temperature", temperature=2.0)
    probs = tiny_engine.score_probs(v, a)
    expected = 1 / (1 + np.exp(-logits / 2.0))
    np.testing.assert_allclose(probs, expected, atol=1e-5)
    tiny_engine.calibrator = Calibrator()


# ── Orchestration with stubbed scoring ────────────────────────────────────


class StubEngine:
    """Deterministic scorer: P(REAL) from a per-call script, else from the
    window's mean pixel value (stable, shape-independent)."""

    def __init__(self, script=None):
        self.script = list(script) if script else None
        self.calls = []
        self.calibrator = Calibrator()
        self.config = TINY

    def score_probs(self, visual, audio):
        n = visual.shape[0]
        self.calls.append(n)
        if self.script is not None:
            out = [
                self.script.pop(0) if self.script else 0.5 for _ in range(n)
            ]
            return np.asarray(out, np.float32)
        base = visual.reshape(n, -1).mean(axis=1)
        return np.clip(0.2 + base, 0.0, 1.0).astype(np.float32)

    def score_logits(self, visual, audio):
        p = self.score_probs(visual, audio)
        return np.log(p / (1 - p))


def _make_predictor(engine, tmp_cfg=None, detector=None):
    cfg = tmp_cfg or PredictorConfig(chunk_size=8, chunk_stride=4)
    return Predictor(
        config=cfg,
        model_config=TINY,
        engine=engine,
        detector_backend=detector,
    )


@pytest.fixture(scope="module")
def short_video(tmp_path_factory):
    pytest.importorskip("cv2")
    # 8 frames -> metadata nb_frames == chunk_size -> SHORT path.
    path = tmp_path_factory.mktemp("pred") / "short.mp4"
    return write_video(path, synthetic_frames(n=8), fps=15.0)


@pytest.fixture(scope="module")
def long_video(tmp_path_factory):
    pytest.importorskip("cv2")
    path = tmp_path_factory.mktemp("pred") / "long.mp4"
    return write_video(path, synthetic_frames(n=60), fps=15.0)


def test_short_path_single_track(short_video):
    engine = StubEngine(script=[0.9])
    p = _make_predictor(engine, detector=FakeDetector(lambda i: [BOX]))
    result = p.predict(short_video)
    assert result["verdict"] == "real"
    assert result["is_real"] and not result["is_fake"]
    assert result["selected_track_id"] is not None
    assert result["tracks"][0]["confidence"] == pytest.approx(0.9, abs=1e-6)
    assert result["speaker_case"] in (
        "all_speaking_real", "mixed_real_and_fake", "all_speaking_fake",
    )
    assert "mouth_motion_check" in result
    # One batched call scored the single track.
    assert engine.calls[0] == 1


def test_short_path_two_tracks_batched(short_video):
    # Two faces -> ONE batched forward with N=2 (not two sequential calls).
    engine = StubEngine(script=[0.9, 0.2])
    boxes = [BOX, (10, 10, 50, 40)]
    p = _make_predictor(engine, detector=FakeDetector(lambda i: list(boxes)))
    result = p.predict(short_video)
    assert engine.calls[0] == 2
    assert len(result["tracks"]) == 2
    assert result["selected_track_id"] == result["tracks"][0]["track_id"]


def test_short_path_refinement_triggers(short_video):
    """Close scores -> phase-2 refinement re-scores top-k tracks."""
    engine = StubEngine(script=[0.50, 0.52, 0.6, 0.55])
    boxes = [BOX, (10, 10, 50, 40)]
    cfg = PredictorConfig(chunk_size=8, chunk_stride=4, refine_margin=0.5)
    p = _make_predictor(engine, cfg, FakeDetector(lambda i: list(boxes)))
    result = p.predict(short_video)
    # phase1 batch of 2, then refinement full-clip calls for top-2 tracks.
    assert engine.calls[0] == 2
    assert len(engine.calls) >= 3
    assert result["tracks"][0]["selection_score"] == pytest.approx(
        0.55 * result["tracks"][0]["confidence"]
        + 0.25 * result["tracks"][0]["stability"]
        + 0.20 * result["tracks"][0]["speaking_activity"],
        abs=1e-6,
    )


def test_long_path_batches_all_windows(long_video):
    engine = StubEngine(script=None)
    p = _make_predictor(engine, detector=FakeDetector(lambda i: [BOX]))
    result = p.predict(long_video)
    # ~60 frames, chunk 8 stride 4 -> ~13 windows, ONE batched call.
    assert len(engine.calls) == 1
    assert engine.calls[0] >= 10
    assert result["total_chunks_analyzed"] == engine.calls[0]
    assert result["window_results"] is not None
    # Window starts are absolute and strictly increasing by stride.
    starts = [w["frame_start"] for w in result["window_results"]]
    assert starts == sorted(starts)
    assert starts[1] - starts[0] == 4
    assert result["speaker_timeline"] is not None
    assert result["video_duration_sec"] == pytest.approx(4.0, abs=0.5)


def test_long_path_minority_fake_gate(long_video):
    """A contiguous strongly-fake segment in mostly-moderate windows forces
    verdict FAKE through the temporal-minority gate."""
    n_windows = 14
    script = [0.55] * (n_windows - 6) + [0.03] * 6
    engine = StubEngine(script=script)
    cfg = PredictorConfig(chunk_size=8, chunk_stride=4, fake_vote_min_windows=3)
    p = _make_predictor(engine, cfg, FakeDetector(lambda i: [BOX]))
    result = p.predict(long_video)
    assert result["window_fake_vote_ratio"] > 0.1
    assert result["verdict"] in ("fake", "uncertain")
    if result["verdict"] == "fake":
        assert result["confidence"] < 0.5


def test_long_path_no_tracks(long_video):
    engine = StubEngine()
    p = _make_predictor(engine, detector=FakeDetector(lambda i: []))
    result = p.predict(long_video)
    # With no detections the tracker returns nothing -> uncertain contract.
    assert result["verdict"] == "uncertain"
    assert result["speaker_case"] == "no_face_detected"
    assert result["total_chunks_analyzed"] == 0


def test_predict_from_path_contract(short_video):
    engine = StubEngine(script=[0.8])
    p = _make_predictor(engine, detector=FakeDetector(lambda i: [BOX]))
    result = p.predict_from_path(short_video)
    assert set(result) == {
        "verdict", "is_real", "is_fake", "confidence",
        "manipulation_probability",
    }
    assert result["confidence"] == pytest.approx(0.8, abs=1e-6)


def test_predictor_close_releases_engine(rng):
    """close() drops the engine's device arrays and compiled callables so
    HBM is reclaimable (the reference frees model/device state on
    shutdown, lifecycle.py:99-110)."""
    model = LipSyncModel(TINY)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8, 32, 32, 3), np.float32),
        np.zeros((1, 80, 32, 1), np.float32),
    )
    engine = ScoringEngine(variables, TINY, use_bfloat16=False)
    p = Predictor(config=PredictorConfig(), model_config=TINY, engine=engine,
                  detector_backend=FakeDetector(lambda i: []))
    p.close()
    assert p.engine is None
    assert not hasattr(engine, "_variables")
    assert not hasattr(engine, "_fwd")
    p.close()  # idempotent


def test_predict_missing_file():
    engine = StubEngine()
    p = _make_predictor(engine)
    with pytest.raises(FileNotFoundError):
        p.predict_from_path("/nonexistent/clip.mp4")


def test_engine_sharded_over_mesh(tiny_engine, rng):
    """Engine with a data mesh: same probs as single-device, batch padded
    to the device count."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lipsync_tpu.parallel import mesh as mesh_lib

    model = LipSyncModel(TINY)
    visual = np.zeros((1, 8, 32, 32, 3), np.float32)
    audio = np.zeros((1, 80, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), visual, audio)
    mesh = mesh_lib.make_mesh(8)
    sharded = ScoringEngine(variables, TINY, use_bfloat16=False, mesh=mesh)

    v = rng.rand(5, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(5, 80, 32).astype(np.float32) * 60) - 60
    p_mesh = sharded.score_probs(v, a)
    p_single = tiny_engine.score_probs(v, a)
    np.testing.assert_allclose(p_mesh, p_single, atol=2e-5)


def test_load_engine_orbax_roundtrip(tmp_path, rng):
    from lipsync_tpu.inference.engine import load_engine
    from lipsync_tpu.training.checkpoints import save_checkpoint

    model = LipSyncModel(TINY)
    visual = np.zeros((1, 8, 32, 32, 3), np.float32)
    audio = np.zeros((1, 80, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), visual, audio)
    save_checkpoint(tmp_path / "ckpt", variables, {"note": "test"})

    engine = load_engine(tmp_path / "ckpt", TINY, use_bfloat16=False)
    v = rng.rand(2, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(2, 80, 32).astype(np.float32) * 60) - 60
    ref = ScoringEngine(variables, TINY, use_bfloat16=False)
    np.testing.assert_allclose(
        engine.score_probs(v, a), ref.score_probs(v, a), atol=1e-6
    )


def test_load_engine_missing_path():
    from lipsync_tpu.inference.engine import load_engine

    with pytest.raises(FileNotFoundError):
        load_engine(Path("/nonexistent/weights.pth"), TINY)


def test_predictor_data_parallel_devices_builds_mesh(tmp_path, rng):
    """PredictorConfig.data_parallel_devices shards the serving engine over
    the first N devices; scoring matches single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lipsync_tpu.training.checkpoints import save_checkpoint

    model = LipSyncModel(TINY)
    visual = np.zeros((1, 8, 32, 32, 3), np.float32)
    audio = np.zeros((1, 80, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), visual, audio)
    save_checkpoint(tmp_path / "ckpt", variables, {"note": "test"})

    p = Predictor(
        model_path=tmp_path / "ckpt",
        config=PredictorConfig(data_parallel_devices=8),
        model_config=TINY,
    )
    assert p.engine.mesh is not None
    assert p.engine.mesh.devices.size == 8
    v = rng.rand(5, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(5, 80, 32).astype(np.float32) * 60) - 60
    single = ScoringEngine(variables, TINY, use_bfloat16=False)
    np.testing.assert_allclose(
        p.engine.score_probs(v, a), single.score_probs(v, a), atol=2e-5
    )


def test_score_track_matches_materialized_windows(tiny_engine, rng):
    """Device window-gather path == host-materialized windows."""
    n, chunk = 20, 8
    crops = rng.rand(n, 32, 32, 3).astype(np.float32)
    starts = [0, 4, 8, 12]
    audio = (rng.rand(len(starts), 80, 32).astype(np.float32) * 60) - 60
    gathered = tiny_engine.score_track_probs(crops, starts, audio)
    # The gather path transfers uint8 (reference crop precision); quantize
    # the materialized comparison identically.
    crops_q = np.clip(crops * 255.0 + 0.5, 0, 255).astype(np.uint8) / 255.0
    materialized = tiny_engine.score_probs(
        np.stack([crops_q[s : s + chunk] for s in starts]).astype(np.float32),
        audio,
    )
    np.testing.assert_allclose(gathered, materialized, atol=2e-5)


def test_score_logits_uint8_matches_float(tiny_engine, rng):
    """uint8-transfer path (default) == float path within quantization.

    score_logits quantizes [0,1] floats to uint8 before host->device
    transfer (4x less traffic) and normalizes on device; passing uint8
    pixels directly takes the same program.
    """
    v = rng.rand(3, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(3, 80, 32).astype(np.float32) * 60) - 60
    default = tiny_engine.score_logits(v, a)  # transfer_uint8=True
    v_u8 = np.clip(v * 255.0 + 0.5, 0, 255).astype(np.uint8)
    explicit_u8 = tiny_engine.score_logits(v_u8, a)
    np.testing.assert_allclose(default, explicit_u8, atol=2e-5)
    # Float path on the pre-quantized pixels agrees too.
    was = tiny_engine.transfer_uint8
    try:
        tiny_engine.transfer_uint8 = False
        float_path = tiny_engine.score_logits(
            v_u8.astype(np.float32) / 255.0, a
        )
    finally:
        tiny_engine.transfer_uint8 = was
    np.testing.assert_allclose(default, float_path, atol=1e-4)


def test_score_track_pads_short_track(tiny_engine, rng):
    """A track shorter than the window tail-pads with its last frame."""
    crops = rng.rand(5, 32, 32, 3).astype(np.float32)  # < chunk_size 8
    audio = (rng.rand(1, 80, 32).astype(np.float32) * 60) - 60
    gathered = tiny_engine.score_track_probs(crops, [0], audio)
    crops_q = np.clip(crops * 255.0 + 0.5, 0, 255).astype(np.uint8) / 255.0
    padded = np.concatenate([crops_q, np.repeat(crops_q[-1:], 3, axis=0)])
    materialized = tiny_engine.score_probs(
        padded[None].astype(np.float32), audio
    )
    np.testing.assert_allclose(gathered, materialized, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_engine_shared(tiny_engine):
    return ScoringEngine(
        tiny_engine._variables, TINY, use_bfloat16=False,
        shared_visual_encoding=True,
    )


def test_shared_encoding_single_window_exact(
    tiny_engine, tiny_engine_shared, rng
):
    """A track of exactly one window has identical temporal conv padding in
    both paths -> shared-track encoding is numerically the per-window
    forward (same ops, same zero edges)."""
    crops = rng.rand(8, 32, 32, 3).astype(np.float32)
    audio = (rng.rand(1, 80, 32).astype(np.float32) * 60) - 60
    shared = tiny_engine_shared.score_track_logits(crops, [0], audio)
    windowed = tiny_engine.score_track_logits(crops, [0], audio)
    np.testing.assert_allclose(shared, windowed, atol=1e-4)


def test_shared_encoding_multiwindow_shapes_and_padding(
    tiny_engine_shared, rng
):
    """Overlapping windows through the shared path: per-window outputs,
    finite, in [0,1] after calibration; short tracks tail-pad."""
    crops = rng.rand(20, 32, 32, 3).astype(np.float32)
    starts = [0, 4, 8, 12]
    audio = (rng.rand(4, 80, 32).astype(np.float32) * 60) - 60
    probs = tiny_engine_shared.score_track_probs(crops, starts, audio)
    assert probs.shape == (4,)
    assert np.all(np.isfinite(probs))
    assert np.all((probs >= 0) & (probs <= 1))
    short = tiny_engine_shared.score_track_probs(
        crops[:5], [0], audio[:1]
    )
    assert short.shape == (1,) and np.isfinite(short[0])


def test_shared_encoding_plumbs_through_configs():
    from lipsync_tpu.serving.config import Settings

    cfg = Settings(shared_visual_encoding=True).to_predictor_config()
    assert cfg.shared_visual_encoding is True
    assert PredictorConfig().shared_visual_encoding is False  # parity default


def test_temporal_smoothed_spans_full_geometry(rng):
    """At the canonical 32/128 geometry the smoother scores the full clip
    plus three 16-frame half-windows at [0:16], [8:24], [16:32]
    (predictor.py:295-331)."""
    engine = StubEngine(script=[0.9, 0.4, 0.6, 0.8])
    full_cfg = ModelConfig()  # 32 frames, 128 mel
    p = Predictor(config=PredictorConfig(), model_config=full_cfg,
                  engine=engine)
    visual = rng.rand(32, 96, 96, 3).astype(np.float32)
    audio = (rng.rand(80, 128).astype(np.float32) * 60) - 60
    agg, confs, spans = p._temporal_smoothed_confidence(visual, audio)
    assert spans == [(0, 32), (0, 16), (8, 24), (16, 32)]
    np.testing.assert_allclose(confs, [0.9, 0.4, 0.6, 0.8], atol=1e-6)
    assert agg == pytest.approx(np.median(confs), abs=1e-6)
    # Two batched calls: full clip (1) + the three sub-windows (3).
    assert engine.calls == [1, 3]


def test_quantized_int8_knob_reaches_load_engine(monkeypatch, tmp_path):
    """Settings.quantized_int8 -> PredictorConfig -> load_engine wiring
    (docs/SERVING.md knob table)."""
    from lipsync_tpu.serving.config import Settings

    s = Settings(quantized_int8=True)
    pc = s.to_predictor_config()
    assert pc.quantized_int8 is True

    import lipsync_tpu.inference.predictor as pred_mod

    captured = {}

    def fake_load_engine(path, model_config, **kw):
        captured.update(kw)

        class _E:
            config = model_config
            calibrator = Calibrator()
        return _E()

    monkeypatch.setattr(pred_mod, "load_engine", fake_load_engine)
    (tmp_path / "w.pth").write_bytes(b"x")
    Predictor(model_path=tmp_path / "w.pth", config=pc)
    assert captured.get("quantized_int8") is True


def test_shared_encoding_sharded_over_mesh(tiny_engine_shared, rng):
    """Shared-track encoding with a data mesh: the crop sequence shards
    over its FRAME axis, so the whole-track encode (the FLOPs of this
    path) spreads across the slice via XLA's spatially-partitioned conv
    instead of running replicated on every device — same logits as the
    single-device shared path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lipsync_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(8)
    sharded = ScoringEngine(
        tiny_engine_shared._variables, TINY, use_bfloat16=False,
        mesh=mesh, shared_visual_encoding=True,
    )
    crops = rng.rand(20, 32, 32, 3).astype(np.float32)
    starts = [0, 4, 8, 12]
    audio = (rng.rand(4, 80, 32).astype(np.float32) * 60) - 60
    got = sharded.score_track_logits(crops, starts, audio)
    want = tiny_engine_shared.score_track_logits(crops, starts, audio)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_shared_encoding_nonpow2_mesh(tiny_engine_shared, rng):
    """A 6-device mesh doesn't divide the 2^k crop padding; the engine
    rounds the frame axis up to a device multiple."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lipsync_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(6)
    sharded = ScoringEngine(
        tiny_engine_shared._variables, TINY, use_bfloat16=False,
        mesh=mesh, shared_visual_encoding=True,
    )
    crops = rng.rand(20, 32, 32, 3).astype(np.float32)
    starts = [0, 4, 8, 12]
    audio = (rng.rand(4, 80, 32).astype(np.float32) * 60) - 60
    got = sharded.score_track_logits(crops, starts, audio)
    want = tiny_engine_shared.score_track_logits(crops, starts, audio)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fold_hf_stem_knob_reaches_load_engine(monkeypatch, tmp_path):
    """Settings.fold_hf_stem -> PredictorConfig -> load_engine wiring, and
    ScoringEngine flips ModelConfig.hf_stem_fold (docs/SERVING.md)."""
    from lipsync_tpu.serving.config import Settings

    s = Settings(fold_hf_stem=True)
    pc = s.to_predictor_config()
    assert pc.fold_hf_stem is True

    import lipsync_tpu.inference.predictor as pred_mod

    captured = {}

    def fake_load_engine(path, model_config, **kw):
        captured.update(kw)

        class _E:
            config = model_config
            calibrator = Calibrator()
        return _E()

    monkeypatch.setattr(pred_mod, "load_engine", fake_load_engine)
    (tmp_path / "w.pth").write_bytes(b"x")
    Predictor(model_path=tmp_path / "w.pth", config=pc)
    assert captured.get("fold_hf_stem") is True


def test_fold_hf_stem_engine_rewrites_config_and_tracks_fp(tiny_engine, rng):
    """ScoringEngine(fold_hf_stem=True) rewrites ModelConfig.hf_stem_fold so
    the jitted forward traces the composed-kernel stem, and its probs track
    the sequential-stem engine on the same variables."""
    eng = ScoringEngine(tiny_engine._variables, TINY, use_bfloat16=False,
                        fold_hf_stem=True)
    assert eng.config.hf_stem_fold is True
    assert eng.fold_hf_stem is True
    v = rng.rand(3, 8, 32, 32, 3).astype(np.float32)
    a = (rng.rand(3, 80, 32).astype(np.float32) * 60) - 60
    np.testing.assert_allclose(
        eng.score_probs(v, a), tiny_engine.score_probs(v, a), atol=1e-3
    )


def test_detection_stride_envelope_warning():
    """detection_stride > 2 is outside the measured IoU envelope (p10 0.578
    at stride 3 vs 0.875 at stride 2, BENCHMARKS.md "Detection stride") and
    must warn loudly; 1-2 stay silent (r3 VERDICT item 9). The package
    logger sets propagate=False, so capture via a handler on it directly."""
    import logging

    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    log = logging.getLogger("lipsync_tpu.inference.predictor")
    h = _Capture(level=logging.WARNING)
    log.addHandler(h)
    try:
        PredictorConfig(detection_stride=2)
        assert not [r for r in records if "detection_stride" in r.getMessage()]
        cfg = PredictorConfig(detection_stride=3)
    finally:
        log.removeHandler(h)
    assert cfg.detection_stride == 3  # honored, not clamped
    warns = [r for r in records if "detection_stride" in r.getMessage()]
    assert warns and "safe envelope" in warns[0].getMessage()

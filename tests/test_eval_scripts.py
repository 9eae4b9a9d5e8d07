"""Eval harness tests: validate_pipeline (both modes), grid eval,
calibrator fitting — driven with stub predictors/engines on tiny data."""

import csv
import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import fit_calibrator  # noqa: E402
import run_grid_eval  # noqa: E402
import validate_pipeline  # noqa: E402


class StubPredictor:
    """Real videos score high, fakes low, one file errors."""

    def __init__(self):
        self.calls = 0

    def _conf(self, path):
        name = Path(path).name
        if "error" in name:
            raise ValueError("corrupt file")
        return 0.9 if "real" in str(path) else 0.1

    def predict(self, path):
        self.calls += 1
        c = self._conf(path)
        return {
            "verdict": "real" if c >= 0.5 else "fake",
            "is_real": c >= 0.5, "is_fake": c < 0.5,
            "confidence": c, "manipulation_probability": 1 - c,
        }

    predict_from_path = predict


@pytest.fixture()
def video_tree(tmp_path):
    real = tmp_path / "real"
    fake = tmp_path / "fake"
    real.mkdir()
    fake.mkdir()
    for i in range(4):
        (real / f"r{i}.mp4").write_bytes(b"x")
        (fake / f"f{i}.mp4").write_bytes(b"x")
    (real / "error_clip.mp4").write_bytes(b"x")
    return tmp_path


def test_validate_pipeline_video_mode(video_tree, tmp_path):
    args = validate_pipeline.build_argparser().parse_args([
        "--data-dir", str(video_tree),
        "--output-dir", str(tmp_path / "out"),
    ])
    m = validate_pipeline.run_video_mode(args, predictor=StubPredictor())
    assert m["accuracy"] == 1.0 and m["f1"] == 1.0
    assert m["errors"] == 1
    out = tmp_path / "out"
    assert (out / "predictions.csv").exists()
    assert (out / "metrics.json").exists()
    assert (out / "confusion_matrix.png").exists()
    assert (out / "roc_curve.png").exists()
    saved = json.loads((out / "metrics.json").read_text())
    assert saved["roc_auc"] == 1.0


def test_validate_pipeline_resume(video_tree, tmp_path):
    out = tmp_path / "out"
    args = validate_pipeline.build_argparser().parse_args([
        "--data-dir", str(video_tree), "--output-dir", str(out),
        "--resume", "--save-every", "2",
    ])
    p1 = StubPredictor()
    validate_pipeline.run_video_mode(args, predictor=p1)
    first_calls = p1.calls
    # Second run resumes: no new predictions.
    p2 = StubPredictor()
    validate_pipeline.run_video_mode(args, predictor=p2)
    assert first_calls == 9 and p2.calls == 0


class StubEngine:
    """prob(real) = mean of the visual tensor (labels encode brightness)."""

    config = SimpleNamespace(video_frames=4, audio_frames=16)

    def score_probs(self, v, a):
        return np.clip(v.reshape(v.shape[0], -1).mean(axis=1), 0, 1)

    def score_logits(self, v, a):
        p = np.clip(self.score_probs(v, a), 1e-4, 1 - 1e-4)
        return np.log(p / (1 - p))


@pytest.fixture()
def preprocessed_dir(tmp_path, rng):
    out = tmp_path / "pre"
    out.mkdir()
    recs = []
    for i in range(10):
        label = i % 2  # 1 = REAL
        key = f"s{i:04d}"
        # Real samples bright (mean ~0.9), fakes dark (~0.1).
        visual = np.full((4, 8, 8, 3), 0.9 if label else 0.1, np.float32)
        audio = np.zeros((80, 16), np.float32)
        np.save(out / f"{key}_v.npy", visual)
        np.save(out / f"{key}_a.npy", audio)
        recs.append({
            "key": key, "source_path": f"/x/{key}.mp4", "label": label,
            "visual_relpath": f"{key}_v.npy", "audio_relpath": f"{key}_a.npy",
            "precompute_mode": "fixed_clip",
        })
    (out / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs)
    )
    return out


def test_validate_pipeline_preprocessed_mode(preprocessed_dir, tmp_path):
    args = validate_pipeline.build_argparser().parse_args([
        "--preprocessed-dir", str(preprocessed_dir),
        "--output-dir", str(tmp_path / "out2"),
        "--batch-size", "4",
    ])
    m = validate_pipeline.run_preprocessed_mode(args, engine=StubEngine())
    assert m["accuracy"] == 1.0
    rows = list(csv.DictReader(
        (tmp_path / "out2" / "predictions.csv").open()
    ))
    assert len(rows) == 10


def test_validate_pipeline_preprocessed_zarr(tmp_path, rng):
    """Same eval path over a zarr-v2 store (reference storage contract,
    precompute_training_tensors.py:341-353)."""
    from lipsync_tpu.utils import zarrlite

    pre = tmp_path / "prez"
    pre.mkdir()
    root = zarrlite.open_group(pre / "samples.zarr", mode="a")
    recs = []
    for i in range(10):
        label = i % 2
        key = f"s{i:04d}"
        grp = root.require_group(key)
        grp.create_array(
            "visual", np.full((4, 8, 8, 3), 0.9 if label else 0.1, np.float32)
        )
        grp.create_array("audio", np.zeros((80, 16), np.float32))
        recs.append({
            "key": key, "source_path": f"/x/{key}.mp4", "label": label,
            "precompute_mode": "fixed_clip", "storage_format": "zarr",
        })
    (pre / "manifest.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs)
    )
    args = validate_pipeline.build_argparser().parse_args([
        "--preprocessed-dir", str(pre),
        "--output-dir", str(tmp_path / "outz"),
        "--batch-size", "4",
    ])
    m = validate_pipeline.run_preprocessed_mode(args, engine=StubEngine())
    assert m["accuracy"] == 1.0


def test_run_grid_eval_labels_csv(tmp_path):
    csv_path = tmp_path / "labels.csv"
    with csv_path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "label"])
        w.writeheader()
        for i in range(3):
            w.writerow({"path": f"/x/real_{i}.mp4", "label": 1})
            w.writerow({"path": f"/x/fake_{i}.mp4", "label": 0})
    m = run_grid_eval.main(
        ["--labels-csv", str(csv_path)], predictor=StubPredictor()
    )
    assert m["accuracy"] == 1.0 and m["f1"] == 1.0


def test_fit_calibrator_all_methods(preprocessed_dir, tmp_path):
    out = fit_calibrator.main(
        [
            "--preprocessed-dir", str(preprocessed_dir),
            "--isotonic-out", str(tmp_path / "iso.pkl"),
        ],
        engine=StubEngine(),
    )
    assert 0.05 <= out["calibration_temperature"] <= 20.0
    assert (tmp_path / "iso.pkl").exists()
    # Isotonic calibrator round-trips through the Calibrator loader.
    from lipsync_tpu.inference.calibration import Calibrator

    cal = Calibrator.from_config(
        method="isotonic", isotonic_path=str(tmp_path / "iso.pkl")
    )
    probs = cal(np.array([-2.0, 0.0, 2.0]))
    assert probs.shape == (3,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_score_tier_in_process(preprocessed_dir, tmp_path):
    # The in-process path reuses one engine across tiers/constructions
    # (eval_cross_tier.score_tier engine=...) — result keys and calibrator
    # rebinding must match the subprocess path's contract.
    import eval_cross_tier

    eng = StubEngine()
    m = eval_cross_tier.score_tier(
        "unused", str(preprocessed_dir), tmp_path / "o1",
        None, None, None, 4, engine=eng)
    assert set(m) >= {"roc_auc", "accuracy", "f1"}
    assert eng.calibrator.method == "none"
    m2 = eval_cross_tier.score_tier(
        "unused", str(preprocessed_dir), tmp_path / "o2",
        0.9, 0.1, None, 4, engine=eng)
    assert eng.calibrator.method == "platt"
    assert m2["roc_auc"] == m["roc_auc"]  # monotone recalibration


def test_fit_platt_bounded_on_separable_data(rng):
    # The reference's unregularized Platt fit diverges (a -> inf) when the
    # calib split is perfectly separable; the smoothed-target fit must stay
    # bounded (measured failure: regen r5, a=103.3 step function).
    from lipsync_tpu.inference.calibration import fit_platt

    logits = np.concatenate([
        rng.normal(6.0, 0.5, 100), rng.normal(-6.0, 0.5, 100)
    ])
    labels = np.concatenate([np.ones(100), np.zeros(100)])
    a, b = fit_platt(logits, labels)
    assert 0.0 < a < 5.0, a
    # Midpoint stays between the two clusters.
    assert -6.0 < -b / a < 6.0
    # Smoothed fit still tracks a non-separable set like the reference fit.
    logits2 = np.concatenate([
        rng.normal(1.0, 1.5, 200), rng.normal(-1.0, 1.5, 200)
    ])
    labels2 = np.concatenate([np.ones(200), np.zeros(200)])
    a_sm, _ = fit_platt(logits2, labels2)
    a_ref, _ = fit_platt(logits2, labels2, smooth_targets=False)
    assert abs(a_sm - a_ref) < 0.15


def test_fit_calibrator_logits_roundtrip(tmp_path, rng):
    # --save-logits / --logits-in lets refits skip TPU re-scoring.
    npz = tmp_path / "cal_logits.npz"
    logits = np.concatenate([rng.normal(3, 1, 50), rng.normal(-3, 1, 50)])
    labels = np.concatenate([np.ones(50), np.zeros(50)])
    np.savez(npz, logits=logits, labels=labels)
    out = fit_calibrator.main(
        ["--logits-in", str(npz), "--method", "platt"]
    )
    assert 0.0 < out["calibration_platt_a"] < 10.0


def test_robustness_grid(preprocessed_dir, tmp_path):
    import eval_robustness_grid as erg

    out = tmp_path / "grid.json"
    args = erg.build_argparser().parse_args([
        "--preprocessed-dir", str(preprocessed_dir),
        "--output", str(out),
        "--batch-size", "4",
    ])
    res = erg.run_grid(args, engine=StubEngine())
    cells = res["cells"]
    names = [n for n, _ in erg.build_grid(4, 16)]
    assert sorted(cells) == sorted(names)
    # Same windows in every cell: the clean cell separates the fixture's
    # bright-real/dark-fake construction perfectly.
    assert cells["clean"]["accuracy"] == 1.0
    assert cells["clean"]["roc_auc"] == 1.0
    # Mel perturbations can't move the visual-only stub.
    assert cells["mel_noise_5db"] == cells["clean"]
    assert cells["av_shift_8f"] == cells["clean"]
    # Brightness scaling shifts the stub's probabilities but not the
    # ranking (AUC invariant under monotone transforms).
    assert cells["brightness_0.7"]["roc_auc"] == 1.0
    assert json.loads(out.read_text())["clips_scored"] == 10


def test_av_shift_moves_audio_not_video(rng):
    import eval_robustness_grid as erg

    v = rng.rand(4, 8, 8, 3).astype(np.float32)
    a = np.tile(np.arange(16, dtype=np.float32), (80, 1)) * -1.0
    fn = erg.av_shift(1, video_frames=4, audio_frames=16)
    v2, a2 = fn(v, a, np.random.RandomState(0))
    assert np.array_equal(v, v2)
    # 1 visual frame = 4 mel cols here: content shifts left by 4,
    # edge-padded with the last column.
    assert np.array_equal(a2[:, :12], a[:, 4:])
    assert np.array_equal(a2[:, 12:], np.repeat(a[:, -1:], 4, axis=1))


def test_eval_cross_tier_matrix(tmp_path, monkeypatch):
    """eval_cross_tier assembles one validate_pipeline run per tier and
    emits the transfer matrix (union-model eval harness)."""
    import eval_cross_tier as ect

    calls = []

    def fake_run(cmd, cwd, text, stdout, stderr):
        calls.append([str(c) for c in cmd])
        out_dir = Path(cmd[cmd.index("--output-dir") + 1])
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "metrics.json").write_text(json.dumps({
            "roc_auc": 0.9, "accuracy": 0.85, "f1": 0.8,
            "precision": 0.8, "recall": 0.8, "total": 10,
        }))
        return SimpleNamespace(returncode=0, stdout="")

    monkeypatch.setattr(ect.subprocess, "run", fake_run)
    out = tmp_path / "xtier.json"
    ect.main([
        "--model-path", "/w/best_model_accuracy",
        "--model-name", "union",
        "--test-dir", "hardened=/pre/h",
        "--test-dir", "phoneme=/pre/p",
        "--calibration-platt-a", "0.7", "--calibration-platt-b", "0.3",
        "--output", str(out),
    ])
    got = json.loads(out.read_text())
    assert got["model"] == "union"
    assert set(got["tiers"]) == {"hardened", "phoneme"}
    assert got["tiers"]["phoneme"]["roc_auc"] == 0.9
    # each run got the model, its tier's dir, and the platt terms
    assert len(calls) == 2
    for cmd, pre in zip(calls, ("/pre/h", "/pre/p")):
        assert "/w/best_model_accuracy" in cmd and pre in cmd
        assert "platt" in cmd and "0.7" in cmd and "0.3" in cmd


def test_eval_cross_tier_rejects_bad_spec(tmp_path):
    import eval_cross_tier as ect

    with pytest.raises(SystemExit):
        ect.main(["--model-path", "/w/m", "--test-dir", "no-equals-dir"])


# ── unseen fake constructions (make_synthetic_dataset warp/splice) ──────


def test_warp_time_map_bounded_and_monotone(rng):
    import make_synthetic_dataset as msd

    sr, n = 16000, 3 * 16000
    for seed in range(5):
        tau = msd._warp_time_map(n, sr, np.random.RandomState(seed))
        dev = np.abs(tau - np.arange(n)) / sr
        assert dev.max() <= 0.30 + 1e-6      # peak deviation <= 0.3 s
        assert dev.max() >= 0.05             # actually warps
        assert np.all(np.diff(tau) > 0) or np.all(np.diff(tau) >= 0)
        assert tau.min() >= 0 and tau.max() <= n - 1


def test_splice_audio_replaces_middle_only(rng):
    import make_synthetic_dataset as msd

    sr = 16000
    n = 3 * sr
    pcm = np.full(n, 0.25, np.float32)
    other = np.full(n, -0.5, np.float32)
    out = msd._splice_audio(pcm, other, sr, np.random.RandomState(0))
    k = int(0.03 * sr)
    # Outer thirds untouched, inner span replaced, seams in between.
    assert np.array_equal(out[: int(n * 0.30)], pcm[: int(n * 0.30)])
    assert np.array_equal(out[int(n * 0.70):], pcm[int(n * 0.70):])
    mid = out[int(n * 0.38) + k: int(n * 0.62) - k]
    assert np.array_equal(mid, other[int(n * 0.38) + k: int(n * 0.62) - k])
    # Crossfade seams stay within the two sources' range (no click spike).
    assert out.min() >= -0.5 - 1e-6 and out.max() <= 0.25 + 1e-6


def test_revoice_is_envelope_matched_but_spectrally_different():
    """The revoice construction: same voiced envelope -> loudness matches;
    scrambled vowels -> the spectra (and thus waveforms) do not."""
    import make_synthetic_dataset as msd

    sr, seconds = 16000, 2.0
    rng = np.random.RandomState(5)
    syl = msd.sample_syllables(seconds, rng)
    _, _, _, f1, f2, va = msd.phoneme_tracks(syl, seconds, sr, rng)
    _, _, _, f1s, f2s, _ = msd.phoneme_tracks(
        msd._scramble_vowels(syl, np.random.RandomState(6)),
        seconds, sr, rng,
    )
    # Same f0 stream for both so the comparison isolates the formants.
    pcm = msd.synth_phoneme_audio(f1, f2, va, sr, np.random.RandomState(9))
    pcm_rv = msd.synth_phoneme_audio(
        f1s, f2s, va, sr, np.random.RandomState(9)
    )
    k = sr // 100  # 10 ms RMS envelope
    n = len(pcm) // k * k

    def env(x):
        return np.sqrt((x[:n].reshape(-1, k) ** 2).mean(axis=1))

    e1, e2 = env(pcm), env(pcm_rv)
    env_corr = float(np.corrcoef(e1, e2)[0, 1])
    assert env_corr > 0.9, "loudness envelope must match"
    rel = np.linalg.norm(pcm - pcm_rv) / np.linalg.norm(pcm)
    assert rel > 0.3, "formant content must differ"


def test_composite_lips_artifacts_localized():
    """_composite_lips changes pixels only in/near the lip boxes and
    leaves A/V timing alone (it never touches frame order or audio)."""
    import make_synthetic_dataset as msd

    sr, seconds, fps = 16000, 1.0, 15.0
    rng = np.random.RandomState(4)
    syl = msd.sample_syllables(seconds, rng)
    o, w_, r, f1, f2, va = msd.phoneme_tracks(syl, seconds, sr, rng)
    pcm = msd.synth_phoneme_audio(f1, f2, va, sr, rng)
    frames, boxes = msd.render_phoneme_clip(
        o, w_, r, pcm, seconds, fps, sr, rng, return_mouth_boxes=True
    )
    out = msd._composite_lips(frames, boxes, np.random.RandomState(0))
    assert out.shape == frames.shape and out.dtype == np.uint8
    changed_any = False
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        diff = out[i].astype(int) != frames[i].astype(int)
        changed = np.argwhere(diff.any(axis=-1))
        if changed.size:
            changed_any = True
            # +-1 px shimmer: everything stays within a 2 px dilation.
            assert changed[:, 0].min() >= y1 - 2
            assert changed[:, 0].max() <= y2 + 2
            assert changed[:, 1].min() >= x1 - 2
            assert changed[:, 1].max() <= x2 + 2
    assert changed_any, "compositing must actually alter the lip region"


def test_generator_fake_modes_cli(tmp_path):
    import make_synthetic_dataset as msd

    out = tmp_path / "ds"
    rc = msd.main(["--output-dir", str(out), "--n-per-class", "6",
                   "--seconds", "1.0", "--style", "phoneme",
                   "--fake-modes",
                   "warp,splice,freeze,revoice,retime,composite",
                   "--seed", "3"])
    assert rc == 0
    # n=6 cycles through all six modes, so each construction renders
    assert len(list((out / "0_real").glob("*.avi"))) == 6
    assert len(list((out / "1_fake").glob("*.avi"))) == 6

    with pytest.raises(SystemExit):
        msd.main(["--output-dir", str(out), "--n-per-class", "1",
                  "--style", "phoneme", "--fake-modes", "nonsense"])


def test_eval_unseen_fakes_pipeline(tmp_path, monkeypatch):
    """The harness generates+precomputes one dir per construction, scores
    each with the model, and annotates seen vs unseen."""
    import eval_unseen_fakes as euf

    steps = []

    def fake_run(cmd, log):
        steps.append([str(c) for c in cmd])

    def fake_score(model_path, pre_dir, out_dir, a, b, limit, bs,
                   engine=None):
        assert model_path == "/w/m" and a == 0.7 and b == -0.1
        assert engine is None  # default path stays subprocess-isolated
        return {"roc_auc": 0.95, "recall": 0.9, "total": 20}

    monkeypatch.setattr(euf, "run", fake_run)
    monkeypatch.setattr(euf, "score_tier", fake_score)
    out = tmp_path / "unseen.json"
    euf.main(["--model-path", "/w/m", "--work-dir", str(tmp_path / "w"),
              "--n-per-class", "10",
              "--calibration-platt-a", "0.7",
              "--calibration-platt-b", "-0.1",
              "--output", str(out)])
    got = json.loads(out.read_text())
    assert set(got["constructions"]) == {
        "shift", "swap", "scramble", "warp", "splice", "freeze",
        "revoice", "retime", "composite"}
    assert got["constructions"]["warp"]["unseen"] is True
    assert got["constructions"]["composite"]["unseen"] is True
    assert got["constructions"]["shift"]["unseen"] is False
    # one generate + one precompute step per construction, with the
    # construction passed as --fake-modes and a distinct seed
    gens = [s for s in steps if "make_synthetic_dataset.py" in s[1]]
    assert len(gens) == 9
    seeds = {s[s.index("--seed") + 1] for s in gens}
    assert len(seeds) == 9
    for s in gens:
        assert s[s.index("--fake-modes") + 1] in got["constructions"]


def test_interference_mixing_label_preserving(tmp_path):
    """--interference-prob (cocktail-party augmentation feeding
    scripts/train_interference_r4.sh) mixes an INDEPENDENT phoneme stream
    under a clip's own audio. Contract: prob=0 leaves the rng sequence —
    and therefore the output — untouched; prob=1 changes the AUDIO while
    keeping duration and the real/fake file inventory (labels ride the
    directory, so label assignment is unchanged by construction); the
    mixer renormalizes so the int16 mux cannot clip."""
    import make_synthetic_dataset as msd
    from lipsync_tpu.preprocessing.ingest import read_audio

    def gen(prob, name):
        d = tmp_path / name
        (d / "r").mkdir(parents=True)
        (d / "f").mkdir()
        args = SimpleNamespace(
            sr=16000, fps=15, seconds=1.0, jitter=False,
            no_head_motion=True, interference_prob=prob,
            interference_gain=(0.35, 0.65))
        msd.write_phoneme_pair(
            args, np.random.RandomState(11), d / "r", d / "f", 0)
        return d

    d_off, d_off2, d_on = gen(0.0, "off"), gen(0.0, "off2"), gen(1.0, "on")
    for rel in ("r/real_0000.avi", "f/fake_0000.avi"):
        a_off = read_audio(d_off / rel)
        a_off2 = read_audio(d_off2 / rel)
        a_on = read_audio(d_on / rel)
        # knob-off determinism: same seed, same PCM bytes
        assert np.array_equal(a_off, a_off2)
        # the mix changes content, not duration
        assert a_on.shape == a_off.shape
        assert not np.array_equal(a_on, a_off)
        # renormalized headroom survives the int16 round-trip
        assert np.abs(a_on).max() <= 1.0 + 1e-3

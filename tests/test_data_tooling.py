"""Native muxer + dataset tooling scripts tests (real A/V round trips)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from lipsync_tpu.preprocessing import ingest
from lipsync_tpu.preprocessing.mux import write_video as mux_write
from tests.fixtures import speechish_pcm, synthetic_frames, write_av_video

import diagnose_videos  # noqa: E402
import filter_corrupt_videos  # noqa: E402
import generate_audio_swap_fakes  # noqa: E402


@pytest.fixture(scope="module")
def av_clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("av")
    return write_av_video(d / "clip.avi", synthetic_frames(45), fps=15.0)


def test_mux_roundtrip(av_clip):
    info = ingest.probe(av_clip)
    assert info.has_audio and info.sample_rate == 16000
    assert info.nb_frames == 45
    frames = ingest.read_video(av_clip, 15.0)
    pcm = ingest.read_audio(av_clip, 16000)
    assert 43 <= len(frames) <= 46
    assert abs(len(pcm) - 48000) < 1000
    # Audio content survives the pcm_s16le round trip.
    ref = speechish_pcm(3.0)
    n = min(len(pcm), len(ref))
    assert np.abs(pcm[:n] - ref[:n]).max() < 2e-3


def test_mux_video_only(tmp_path):
    p = mux_write(tmp_path / "v.avi", synthetic_frames(10), fps=15.0)
    info = ingest.probe(p)
    assert not info.has_audio
    assert len(ingest.read_video(p, 15.0)) >= 9


def test_full_predictor_on_av_clip(av_clip):
    """End-to-end: real container with BOTH streams through the production
    pipeline (VAD, audio alignment, guards) with a stub scorer."""
    from tests.test_predictor import StubEngine, _make_predictor
    from lipsync_tpu.preprocessing.face_detection import FakeDetector

    engine = StubEngine()
    p = _make_predictor(engine, detector=FakeDetector(lambda i: [(60, 70, 110, 105)]))
    result = p.predict(av_clip)
    assert result["verdict"] in ("real", "fake", "uncertain")
    assert result["total_chunks_analyzed"] >= 5
    assert result["window_results"] is not None
    # VAD coverage came from the real audio stream.
    assert any(w["vad_coverage"] > 0 for w in result["window_results"])


def test_generate_audio_swap_fakes(tmp_path):
    real_dir = tmp_path / "real"
    real_dir.mkdir()
    write_av_video(real_dir / "a.avi", synthetic_frames(30, seed=1), fps=15.0,
                   pcm=speechish_pcm(2.0, seed=1))
    write_av_video(real_dir / "b.avi", synthetic_frames(30, seed=2), fps=15.0,
                   pcm=speechish_pcm(2.0, seed=2))
    out_dir = tmp_path / "fakes"
    made = generate_audio_swap_fakes.main([
        "--real-dir", str(real_dir), "--output-dir", str(out_dir),
        "--limit", "2",
    ])
    assert made == 2
    fakes = list(out_dir.glob("*.avi"))
    assert len(fakes) == 2
    for f in fakes:
        info = ingest.probe(f)
        assert info.has_audio and info.nb_frames >= 28


def test_filter_corrupt_videos(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    write_av_video(data / "good.avi", synthetic_frames(30), fps=15.0)
    (data / "bad.mp4").write_bytes(b"not a video at all")
    moved = filter_corrupt_videos.main([
        "--data-dir", str(data), "--no-face-check",
    ])
    assert moved == 1
    assert (data / "good.avi").exists()
    assert not (data / "bad.mp4").exists()
    assert (tmp_path / "corruptedclips" / "bad.mp4").exists()


def test_diagnose_videos(tmp_path, capsys):
    data = tmp_path / "d"
    data.mkdir()
    write_av_video(data / "ok.avi", synthetic_frames(15), fps=15.0)
    (data / "broken.mp4").write_bytes(b"xx")
    reports = diagnose_videos.main(["--data-dir", str(data)])
    by_name = {Path(r["path"]).name: r for r in reports}
    assert by_name["ok.avi"]["decode"].startswith("ok")
    assert "FAILED" in by_name["broken.mp4"]["decode"] or \
        by_name["broken.mp4"]["probe"]["nb_frames"] == 0


def test_merge_preprocessed_dirs(tmp_path, rng):
    """Union of two preprocessed dirs loads as one dataset with prefixed
    keys and symlinked payloads (scripts/merge_preprocessed_dirs.py)."""
    import merge_preprocessed_dirs as mpd

    from lipsync_tpu.training.data import LipSyncDataset
    from lipsync_tpu.utils import zarrlite

    def make_src(root, n, fill):
        root.mkdir()
        g = zarrlite.open_group(root / "samples.zarr", mode="a")
        recs = []
        for i in range(n):
            key = f"sample_{i:03d}"
            sub = g.require_group(key)
            sub.create_array(
                "visual", np.full((6, 8, 8, 3), fill, np.uint8)
            )
            sub.create_array("audio", np.zeros((80, 40), np.float32))
            recs.append({
                "key": key, "source_path": f"/x/{key}.mp4", "label": i % 2,
                "precompute_mode": "full_sequence",
                "storage_format": "zarr", "target_fps": 15.0,
                "mel_hz": 100.0,
            })
        (root / "manifest.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs)
        )

    make_src(tmp_path / "a", 3, fill=10)
    make_src(tmp_path / "b", 2, fill=200)
    out = tmp_path / "union"
    n = mpd.merge([tmp_path / "a", tmp_path / "b"], out)
    assert n == 5

    ds = LipSyncDataset(preprocessed_dir=out, video_frames=4,
                        audio_frames=16)
    assert len(ds) == 5
    keys = {r["key"] for r in ds._manifest}
    assert "d0_sample_000" in keys and "d1_sample_001" in keys
    # Payloads resolve through the symlinks to the right source.
    got = [ds.get_item(i, train_mode_override=False) for i in range(5)]
    fills = sorted(round(float(v.mean()), 2) for v, a, label in got)
    assert fills[0] == fills[1] == fills[2]   # three dim clips from a
    assert fills[3] == fills[4]               # two bright clips from b
    assert fills[3] > fills[0]


def test_merge_limit_per_source(tmp_path):
    """--limit-per-source caps a source class-balanced (HBM budgeting for
    device-cache unions)."""
    import merge_preprocessed_dirs as mpd

    from lipsync_tpu.utils import zarrlite

    def make_src(root, n):
        root.mkdir()
        g = zarrlite.open_group(root / "samples.zarr", mode="a")
        recs = []
        for i in range(n):
            key = f"s_{i:03d}"
            sub = g.require_group(key)
            sub.create_array("visual", np.zeros((6, 8, 8, 3), np.uint8))
            sub.create_array("audio", np.zeros((80, 40), np.float32))
            recs.append({"key": key, "source_path": f"/x/{key}.mp4",
                         "label": i % 2,
                         "precompute_mode": "full_sequence",
                         "storage_format": "zarr", "target_fps": 15.0,
                         "mel_hz": 100.0})
        (root / "manifest.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs)
        )

    make_src(tmp_path / "a", 10)
    make_src(tmp_path / "b", 4)
    out = tmp_path / "u"
    n = mpd.merge([tmp_path / "a", tmp_path / "b"], out,
                  limit_per_source=[6, None])
    assert n == 10  # 6 capped + 4 uncapped
    recs = [json.loads(x) for x in
            (out / "manifest.jsonl").read_text().splitlines()]
    a_recs = [r for r in recs if r["key"].startswith("d0_")]
    assert len(a_recs) == 6
    labels = [r["label"] for r in a_recs]
    assert labels.count(0) == 3 and labels.count(1) == 3  # balanced


def test_h264_roundtrip_preserves_content(tmp_path):
    """Codec round-trip (the robustness-grid perturbation): exact frame
    count/shape back, content close at low CRF, monotonically lossier as
    CRF rises."""
    from lipsync_tpu.preprocessing.mux import h264_roundtrip

    frames = synthetic_frames(12, h=96, w=96)

    def err(crf):
        rt = h264_roundtrip(frames, crf)
        assert rt.shape == frames.shape and rt.dtype == np.uint8
        return float(
            np.mean((rt.astype(np.float32) - frames.astype(np.float32)) ** 2)
        )

    e18, e38 = err(18), err(38)
    assert e18 < e38, "higher CRF must be lossier"
    assert np.sqrt(e18) < 25.0, "CRF 18 should stay visually close"


def test_write_video_h264_container(tmp_path):
    """The codec-parameterized muxer writes a decodable H.264 mp4."""
    p = mux_write(
        tmp_path / "v.mp4", synthetic_frames(10), fps=15.0,
        vcodec="libx264", vcodec_opts="crf=23:preset=veryfast",
    )
    info = ingest.probe(p)
    assert info.nb_frames >= 9
    assert len(ingest.read_video(p, 15.0)) >= 9

"""Native C++ ingest library tests (video decode, fps resampling, audio)."""

import numpy as np
import pytest

from lipsync_tpu.preprocessing import ingest
from tests.fixtures import synthetic_frames, write_video, write_wav


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    pytest.importorskip("cv2")
    path = tmp_path_factory.mktemp("media") / "clip.mp4"
    return write_video(path, synthetic_frames(n=90), fps=30.0)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    return write_wav(tmp_path_factory.mktemp("media") / "a.wav", seconds=2.0)


def test_native_lib_builds():
    assert ingest.get_native_lib() is not None


def test_probe_video(video_path):
    info = ingest.probe(video_path)
    assert info.width == 160 and info.height == 120
    assert abs(info.fps - 30.0) < 0.5
    assert abs(info.duration_sec - 3.0) < 0.2
    assert 85 <= info.nb_frames <= 95


def test_read_video_resamples_to_15fps(video_path):
    frames = ingest.read_video(video_path, target_fps=15.0)
    # 3 s at 15 fps -> ~45 frames (reference: int(duration*fps)).
    assert 43 <= len(frames) <= 46
    assert frames.shape[1:] == (120, 160, 3)
    assert frames.dtype == np.uint8
    # Content sanity: frames have the bright face oval.
    assert frames[0].mean() > 20


def test_read_video_native_matches_cv2_fallback(video_path):
    native = ingest.read_video(video_path, target_fps=15.0, max_total_frames=30)
    cv2_frames = ingest._read_video_cv2(video_path, 15.0, 30)
    assert len(native) == len(cv2_frames)
    # Same sampling -> near-identical pixels (codecs may differ by rounding).
    diff = np.abs(
        native.astype(np.int16) - cv2_frames.astype(np.int16)
    ).mean()
    assert diff < 2.0


def test_read_video_max_frames(video_path):
    frames = ingest.read_video(video_path, target_fps=15.0, max_total_frames=10)
    assert len(frames) == 10


def test_read_video_with_resize(video_path):
    frames = ingest.read_video(
        video_path, target_fps=15.0, max_total_frames=8, out_size=(80, 60)
    )
    assert frames.shape == (8, 60, 80, 3)


def test_read_audio_wav_native(wav_path):
    y = ingest.read_audio(wav_path, sr=16000)
    assert 31000 <= len(y) <= 33000
    assert y.dtype == np.float32
    assert 0.01 < np.abs(y).max() <= 1.0


def test_read_audio_resample(wav_path):
    y8 = ingest.read_audio(wav_path, sr=8000)
    y16 = ingest.read_audio(wav_path, sr=16000)
    assert abs(len(y16) / len(y8) - 2.0) < 0.01


def test_read_audio_matches_wave_fallback(wav_path):
    native = ingest.read_audio(wav_path, sr=16000)
    fallback = ingest._read_audio_wave(wav_path, 16000)
    n = min(len(native), len(fallback))
    assert n > 30000
    np.testing.assert_allclose(native[:n], fallback[:n], atol=1e-4)


def test_video_without_audio_returns_empty(video_path):
    y = ingest.read_audio(video_path, sr=16000)
    assert len(y) == 0


def test_probe_missing_file():
    info = ingest.probe("/nonexistent/file.mp4")
    assert info.nb_frames == 0 and info.fps == 0.0

"""Tests for device preprocessing ops: log-mel, VAD, crop/resize."""

import numpy as np
import pytest

import jax.numpy as jnp

from lipsync_tpu.ops.image import crop_resize_normalize, resize_bilinear
from lipsync_tpu.ops.mel import (
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_truncate_frames,
    power_to_db,
)
from lipsync_tpu.ops.vad import detect_voice_activity_pcm


# --- independent numpy twin of the librosa mel pipeline --------------------


def numpy_log_mel(y, sr=16000, n_fft=400, hop=160, n_mels=80):
    """Loop-based reference implementation, structured differently from the
    JAX op (per-frame python loop, np.fft) to catch vectorization bugs."""
    pad = n_fft // 2
    yp = np.concatenate([np.zeros(pad), y, np.zeros(pad)])
    w = hann_window(n_fft).astype(np.float64)
    n_frames = 1 + (len(yp) - n_fft) // hop
    power = np.empty((n_frames, 1 + n_fft // 2))
    for i in range(n_frames):
        seg = yp[i * hop : i * hop + n_fft] * w
        power[i] = np.abs(np.fft.rfft(seg)) ** 2
    fb = mel_filterbank(sr, n_fft, n_mels).astype(np.float64)
    mel = (power @ fb.T).T
    amin = 1e-10
    ref = max(mel.max(), amin)
    db = 10 * np.log10(np.maximum(mel, amin)) - 10 * np.log10(ref)
    return np.maximum(db, db.max() - 80.0)


def test_hann_window_matches_scipy():
    from scipy.signal import get_window

    np.testing.assert_allclose(
        hann_window(400), get_window("hann", 400, fftbins=True), atol=1e-7
    )


def test_mel_filterbank_properties():
    fb = mel_filterbank()
    assert fb.shape == (80, 201)
    # Every filter has support, is non-negative, and neighbors overlap.
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # Slaney normalization: peak amplitudes shrink as bandwidth grows.
    assert fb[0].max() > fb[-1].max()


def test_log_mel_matches_numpy_twin(rng):
    y = rng.randn(16000).astype(np.float32) * 0.1
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(y)))
    ref = numpy_log_mel(y.astype(np.float64))
    assert ours.shape == ref.shape == (80, 101)
    assert np.abs(ours - ref).max() < 1e-2  # dB scale


def test_log_mel_pure_tone_peak():
    """1 kHz tone must peak in the mel band containing 1 kHz."""
    sr = 16000
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(y)))
    fb = mel_filterbank()
    freqs = np.linspace(0, sr / 2, fb.shape[1])
    peak_band = mel.mean(axis=1).argmax()
    band_center = freqs[fb[peak_band].argmax()]
    assert 850 < band_center < 1150


def test_log_mel_frame_count_matches_reference_contract():
    """100 mel frames per second (BASELINE.md: hop 160 @ 16 kHz)."""
    for n_sec in (1, 2, 3):
        y = jnp.zeros(16000 * n_sec)
        mel = log_mel_spectrogram(y)
        assert mel.shape == (80, 100 * n_sec + 1)


def test_pad_or_truncate_frames():
    mel = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    padded = pad_or_truncate_frames(mel, 6)
    assert padded.shape == (1, 3, 6)
    np.testing.assert_array_equal(padded[..., 3], padded[..., 5])
    truncated = pad_or_truncate_frames(mel, 2)
    np.testing.assert_array_equal(truncated, mel[..., :2])


def test_power_to_db_top_db_floor():
    s = jnp.asarray([[1.0, 1e-12]])
    db = np.asarray(power_to_db(s))
    assert db[0, 0] == 0.0
    assert db[0, 1] == -80.0


# --- VAD -------------------------------------------------------------------


def test_vad_flags_speech_not_silence(rng):
    # True digital silence: the reference's 1e-8 energy floor (audio.py:204)
    # means a noise floor at ~1e-4 amplitude sits exactly at threshold, so
    # only sub-floor silence is reliably rejected — same as the reference.
    sr = 16000
    sil = np.zeros(sr)
    tone = np.sin(2 * np.pi * 220 * np.arange(sr) / sr) * 0.5
    y = np.concatenate([sil, tone, sil]).astype(np.float32)
    mask, dur = detect_voice_activity_pcm(y, sr)
    assert abs(dur - 3.0) < 1e-6
    third = len(mask) // 3
    assert mask[third + 5 : 2 * third - 5].mean() > 0.95
    assert mask[5 : third - 5].mean() < 0.2


def test_vad_empty_audio_all_true():
    mask, dur = detect_voice_activity_pcm(np.zeros(0, np.float32))
    assert dur == 0.0 and mask.all()


# --- image ops -------------------------------------------------------------


def test_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = (rng.rand(31, 47, 3) * 255).astype(np.uint8)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 96, 96))
    ref = cv2.resize(img, (96, 96), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_crop_resize_normalize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    frames = (rng.rand(4, 64, 80, 3) * 255).astype(np.uint8)
    boxes = np.array(
        [[10, 5, 50, 40], [0, 0, 80, 64], [20, 20, 45, 45], [3, 7, 60, 30]],
        np.int32,
    )
    out = np.asarray(
        crop_resize_normalize(jnp.asarray(frames), jnp.asarray(boxes), 32)
    )
    assert out.shape == (4, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        ref = cv2.resize(
            frames[i, y1:y2, x1:x2], (32, 32), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32) / 255.0
        # cv2 uses fixed-point bilinear internally (~1/256 quantization).
        assert np.abs(out[i] - ref).max() < 0.005


# --- Pallas fused mel kernel (interpret mode on CPU) -----------------------


def test_pallas_mel_matches_xla(rng):
    from lipsync_tpu.ops.pallas.mel_kernel import log_mel_spectrogram_pallas

    y = rng.randn(16000).astype(np.float32) * 0.2
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y)))
    ours = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(y), interpret=True)
    )
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 1e-3  # dB


def test_shift_matmul_conv_matches_nn_conv(rng):
    """ShiftMatmulConv is bit-comparable to nn.Conv with shared params at
    the artifact-branch geometry (3x3x3 kernel over a T x 3 x 3 map)."""
    import jax
    from flax import linen as nn

    from lipsync_tpu.models.layers import ShiftMatmulConv

    x = jnp.asarray(rng.randn(2, 8, 3, 3, 16), jnp.float32)
    ref_mod = nn.Conv(8, kernel_size=(3, 3, 3), strides=(1, 1, 1),
                      padding=((1, 1),) * 3, use_bias=True)
    sm_mod = ShiftMatmulConv(8, kernel_size=(3, 3, 3),
                             padding=((1, 1),) * 3, use_bias=True)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(variables, x)
    got = sm_mod.apply(variables, x)  # same param tree: kernel + bias
    assert got.shape == ref.shape
    with jax.default_matmul_precision("highest"):
        got_hp = sm_mod.apply(variables, x)
        ref_hp = ref_mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got_hp), np.asarray(ref_hp),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-2)


def test_int8_conv_matches_nn_conv_within_quant_error(rng):
    """Int8Conv shares nn.Conv's param tree and tracks it within dynamic
    8-bit quantization error (layers.Int8Conv docstring)."""
    import jax
    from flax import linen as nn

    from lipsync_tpu.models.layers import Int8Conv

    x = jnp.asarray(rng.randn(2, 8, 12, 12, 16).astype(np.float32))
    kw = dict(kernel_size=(3, 3, 3), strides=(1, 2, 2),
              padding=((1, 1), (1, 1), (1, 1)), use_bias=False)
    ref = nn.Conv(24, **kw)
    q = Int8Conv(24, **kw)
    variables = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(q.init(jax.random.PRNGKey(0), x))
    )
    y_ref = np.asarray(ref.apply(variables, x))
    y_q = np.asarray(q.apply(variables, x))
    rel = np.linalg.norm(y_q - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.02, rel


def test_int8_model_lowering_tracks_fp_logits(rng):
    """conv_lowering='int8' loads the SAME variables and stays within the
    bf16 noise floor (|dprob| <= 3.5e-3, BENCHMARKS.md) of the fp path."""
    import dataclasses

    import jax

    from lipsync_tpu.models import LipSyncModel, ModelConfig

    tiny = ModelConfig(video_frames=8, crop_size=32, mel_bins=80,
                       audio_frames=32)
    v = jnp.asarray(rng.rand(2, 8, 32, 32, 3).astype(np.float32))
    a = jnp.asarray((rng.rand(2, 80, 32, 1) * 80 - 80).astype(np.float32))
    fp = LipSyncModel(tiny)
    variables = fp.init(jax.random.PRNGKey(0), v, a)
    q = LipSyncModel(dataclasses.replace(tiny, conv_lowering="int8"))
    lf = np.asarray(fp.apply(variables, v, a))
    lq = np.asarray(q.apply(variables, v, a))
    dprob = np.abs(1 / (1 + np.exp(-lf)) - 1 / (1 + np.exp(-lq)))
    assert dprob.max() < 5e-3, dprob.max()


def test_pallas_hf_stem_matches_xla(rng):
    """Fused Laplacian+conv1 kernel vs the XLA reference path (interpret
    mode). The kernel measured SLOWER than XLA on the real chip and is
    NOT wired into the model (hf_stem.py docstring records the pass);
    this test keeps the reference implementation honest."""
    import jax

    from lipsync_tpu.ops.pallas.hf_stem import hf_stem_fused

    B, T, H = 2, 4, 16
    v = jnp.asarray(rng.rand(B, T, H, H, 3), jnp.float32)
    wlap = jnp.asarray(rng.randn(3, 3, 3, 3) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 3, 32) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    g = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    bb = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    mu = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    var = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)

    f = v.reshape(-1, H, H, 3)
    lap = jax.lax.conv_general_dilated(
        f, wlap, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        lap.reshape(B, T, H, H, 3), w1, (1, 2, 2),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC")) + b1
    want = jnp.maximum((y - mu) / jnp.sqrt(var + 1e-5) * g + bb, 0.0)

    got = hf_stem_fused(v, wlap, w1, b1, g, bb, mu, var, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_hf_stem_fold_param_tree_and_numerics(rng):
    """fold_stem composes the Laplacian into conv1 with an IDENTICAL param
    tree (structure, shapes, and init values — same RNG paths). Exact to
    fp32 rounding whenever the input carries a 2-px zero border (the only
    deviation source is the sequential path's zeroed intermediate ring);
    bounded on arbitrary input (artifact._FoldedStemConvBN docstring)."""
    import jax
    import jax.tree_util as tu

    from lipsync_tpu.models.artifact import HighFrequencyDetector

    x = rng.rand(2, 8, 32, 32, 3).astype(np.float32)
    ref = HighFrequencyDetector(16)
    fold = HighFrequencyDetector(16, fold_stem=True)
    v_ref = ref.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v_fold = fold.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert tu.tree_structure(v_ref) == tu.tree_structure(v_fold)
    for a, b in zip(tu.tree_leaves(v_ref), tu.tree_leaves(v_fold)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    xz = x.copy()
    xz[:, :, :2] = 0
    xz[:, :, -2:] = 0
    xz[:, :, :, :2] = 0
    xz[:, :, :, -2:] = 0
    with jax.default_matmul_precision("highest"):
        y_ref = np.asarray(ref.apply(v_ref, jnp.asarray(xz)))
        y_fold = np.asarray(fold.apply(v_ref, jnp.asarray(xz)))
        np.testing.assert_allclose(y_fold, y_ref, atol=1e-5)
        y_ref = np.asarray(ref.apply(v_ref, jnp.asarray(x)))
        y_fold = np.asarray(fold.apply(v_ref, jnp.asarray(x)))
    assert np.abs(y_fold - y_ref).max() < 0.05  # border ring, pooled


def test_hf_stem_fold_model_logits_close(rng):
    """hf_stem_fold=True loads the SAME variables; end-to-end the border
    deviation washes out through the stem's mean-pool + MLP (measured
    |dprob| 4.7e-5 fp32 at 32-px crops; production 96-px crops have a 3x
    smaller border fraction)."""
    import dataclasses

    import jax
    import jax.tree_util as tu

    from lipsync_tpu.models import LipSyncModel, ModelConfig

    tiny = ModelConfig(video_frames=8, crop_size=32, mel_bins=80,
                       audio_frames=32)
    v = jnp.asarray(rng.rand(2, 8, 32, 32, 3).astype(np.float32))
    a = jnp.asarray((rng.rand(2, 80, 32, 1) * 80 - 80).astype(np.float32))
    fp = LipSyncModel(tiny)
    variables = fp.init(jax.random.PRNGKey(0), v, a)
    folded = LipSyncModel(dataclasses.replace(tiny, hf_stem_fold=True))
    assert tu.tree_structure(variables) == tu.tree_structure(
        folded.init(jax.random.PRNGKey(0), v, a)
    )
    lf = np.asarray(fp.apply(variables, v, a))
    lq = np.asarray(folded.apply(variables, v, a))
    dprob = np.abs(1 / (1 + np.exp(-lf)) - 1 / (1 + np.exp(-lq)))
    assert dprob.max() < 1e-3, dprob.max()

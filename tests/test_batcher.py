"""Cross-request dynamic batching tests (inference/batcher.py)."""

import threading
import time

import numpy as np
import pytest

from lipsync_tpu.inference.batcher import CoalescingEngine
from lipsync_tpu.inference.calibration import Calibrator


class RecordingEngine:
    """Deterministic scorer: logit = mean of the window's pixels. Records
    every forward's batch size; optional per-forward latency."""

    def __init__(self, latency_s: float = 0.0, fail: bool = False):
        self.max_batch = 32
        self.calibrator = Calibrator()
        self.batch_sizes = []
        self.latency_s = latency_s
        self.fail = fail
        self._lock = threading.Lock()

    def score_logits(self, visual, audio):
        with self._lock:
            self.batch_sizes.append(int(visual.shape[0]))
        if self.fail:
            raise ValueError("boom")
        if self.latency_s:
            time.sleep(self.latency_s)
        return visual.reshape(visual.shape[0], -1).mean(axis=1).astype(
            np.float32
        )


def _windows(seed: int, n: int):
    rng = np.random.RandomState(seed)
    return (
        rng.rand(n, 4, 8, 8, 3).astype(np.float32),
        rng.rand(n, 80, 16).astype(np.float32),
    )


def test_results_match_direct_scoring_under_concurrency():
    inner = RecordingEngine(latency_s=0.01)
    ce = CoalescingEngine(inner, max_wait_ms=5.0)
    try:
        inputs = [_windows(s, 3 + s % 4) for s in range(8)]
        expected = [
            v.reshape(v.shape[0], -1).mean(axis=1) for v, _ in inputs
        ]
        results = [None] * len(inputs)

        def work(i):
            v, a = inputs[i]
            results[i] = ce.score_logits(v, a)

        threads = [
            threading.Thread(target=work, args=(i,))
            for i in range(len(inputs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for got, want in zip(results, expected):
            np.testing.assert_allclose(got, want, rtol=1e-6)
        # The whole point: fewer forwards than callers.
        assert inner.batch_sizes, "no forwards ran"
        assert len(inner.batch_sizes) < len(inputs)
        assert ce.items_coalesced == len(inputs)
        assert ce.batches_dispatched == len(inner.batch_sizes)
    finally:
        ce.close()


def test_oversized_request_streams_in_chunks():
    inner = RecordingEngine()
    ce = CoalescingEngine(inner, max_wait_ms=0.0)
    try:
        v, a = _windows(0, 70)  # > max_batch=32
        out = ce.score_logits(v, a)
        np.testing.assert_allclose(
            out, v.reshape(70, -1).mean(axis=1), rtol=1e-6
        )
        assert all(b <= 32 for b in inner.batch_sizes)
        assert sum(inner.batch_sizes) == 70
    finally:
        ce.close()


def test_batch_cap_respected_when_coalescing():
    inner = RecordingEngine(latency_s=0.02)
    ce = CoalescingEngine(inner, max_wait_ms=10.0)
    try:
        threads = [
            threading.Thread(
                target=lambda s=s: ce.score_logits(*_windows(s, 20))
            )
            for s in range(4)  # 80 windows total vs cap 32
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(b <= 32 for b in inner.batch_sizes)
        assert sum(inner.batch_sizes) == 80
    finally:
        ce.close()


def test_score_probs_applies_calibrator():
    inner = RecordingEngine()
    ce = CoalescingEngine(inner, max_wait_ms=0.0)
    try:
        v, a = _windows(1, 4)
        probs = ce.score_probs(v, a)
        logits = v.reshape(4, -1).mean(axis=1)
        np.testing.assert_allclose(
            probs, 1.0 / (1.0 + np.exp(-logits)), rtol=1e-5
        )
    finally:
        ce.close()


def test_error_propagates_to_callers():
    inner = RecordingEngine(fail=True)
    ce = CoalescingEngine(inner, max_wait_ms=0.0)
    try:
        with pytest.raises(ValueError, match="boom"):
            ce.score_logits(*_windows(2, 4))
    finally:
        ce.close()


def test_close_unblocks_and_rejects():
    inner = RecordingEngine()
    ce = CoalescingEngine(inner, max_wait_ms=0.0)
    ce.close()
    with pytest.raises(RuntimeError):
        ce.score_logits(*_windows(3, 2))


def test_passthrough_attributes():
    inner = RecordingEngine()
    inner.config = "cfg-sentinel"
    ce = CoalescingEngine(inner, max_wait_ms=0.0)
    try:
        assert ce.config == "cfg-sentinel"
        assert ce.max_batch == 32
        new_cal = Calibrator()
        ce.calibrator = new_cal
        assert inner.calibrator is new_cal
    finally:
        ce.close()


def test_serving_startup_wraps_engine():
    """AppState.startup wraps the predictor's engine when the knob is on
    and leaves it bare when off."""
    from lipsync_tpu.serving.app import AppState
    from lipsync_tpu.serving.config import Settings

    class P:
        def __init__(self):
            self.engine = RecordingEngine()
            self.engine.warmup = lambda: None

        def close(self):
            pass

    for knob, wrapped in ((True, True), (False, False)):
        p = P()
        state = AppState(
            settings=Settings(
                coalesce_requests=knob, run_embedded_worker=False,
                sqlite_db_path=":memory:",
            ),
            predictor=p,
        )
        state.startup(load_model=False)
        try:
            assert isinstance(p.engine, CoalescingEngine) == wrapped
        finally:
            state.shutdown()

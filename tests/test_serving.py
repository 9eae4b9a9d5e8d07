"""Serving layer tests: live HTTP server + job queue + worker, driven
through real sockets with httpx (the production interface, not internals)."""

import json
import time

import numpy as np
import pytest

httpx = pytest.importorskip("httpx")

from lipsync_tpu.serving.app import AppState, Server, parse_multipart
from lipsync_tpu.serving.config import Settings
from lipsync_tpu.serving.jobs import PENDING, PROCESSING, JobStore
from lipsync_tpu.serving.worker import JobWorker
from tests.fixtures import synthetic_frames, write_video


class FakePredictor:
    def __init__(self, result=None, fail=False):
        self.result = result or {
            "verdict": "real", "is_real": True, "is_fake": False,
            "confidence": 0.9, "manipulation_probability": 0.1,
            "detail": "ok", "selection_margin": 1.0, "tracks": None,
        }
        self.fail = fail
        self.calls = 0

    def predict(self, path):
        self.calls += 1
        if self.fail:
            raise ValueError("bad input video")
        return dict(self.result)

    def close(self):
        pass


@pytest.fixture()
def server(tmp_path):
    settings = Settings(
        port=0, sqlite_db_path=str(tmp_path / "jobs.db"),
        run_embedded_worker=False,
    )
    state = AppState(settings=settings, predictor=FakePredictor())
    srv = Server(state, load_model=False)
    srv.start_background()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return httpx.Client(base_url=f"http://127.0.0.1:{server.port}")


def _upload_files():
    return {"video_file": ("clip.mp4", b"\x00\x01fakebytes", "video/mp4")}


def test_root_and_health(client):
    r = client.get("/")
    assert r.status_code == 200
    assert "/api/lip-sync" in r.json()["endpoints"]
    assert client.get("/healthz").json()["model_loaded"] is True


def test_lip_sync_endpoint(client, server):
    r = client.post("/api/lip-sync", files=_upload_files())
    assert r.status_code == 200
    body = r.json()
    assert body["verdict"] == "real"
    assert body["confidence"] == 0.9
    assert server.state.predictor.calls == 1


def test_lip_sync_400_on_value_error(tmp_path):
    settings = Settings(
        port=0, sqlite_db_path=str(tmp_path / "j.db"),
        run_embedded_worker=False,
    )
    state = AppState(settings=settings, predictor=FakePredictor(fail=True))
    srv = Server(state, load_model=False)
    srv.start_background()
    try:
        c = httpx.Client(base_url=f"http://127.0.0.1:{srv.port}")
        r = c.post("/api/lip-sync", files=_upload_files())
        assert r.status_code == 400
        assert "bad input video" in r.json()["detail"]
    finally:
        srv.stop()


def test_lip_sync_503_without_model(tmp_path):
    settings = Settings(
        port=0, sqlite_db_path=str(tmp_path / "j.db"),
        run_embedded_worker=False,
        model_path=tmp_path / "missing.pth",
    )
    srv = Server(AppState(settings=settings), load_model=True)
    srv.start_background()
    try:
        c = httpx.Client(base_url=f"http://127.0.0.1:{srv.port}")
        r = c.post("/api/lip-sync", files=_upload_files())
        assert r.status_code == 503
        assert "Model not loaded" in r.json()["detail"]
    finally:
        srv.stop()


def test_job_flow_end_to_end(client, server):
    # Create job.
    r = client.post("/jobs", files=_upload_files())
    assert r.status_code == 200
    job_id = r.json()["job_id"]
    assert r.json()["status"] == PENDING

    # Not completed yet -> 202.
    r = client.get(f"/result/{job_id}")
    assert r.status_code == 202

    # Run the worker once.
    worker = JobWorker(server.state.predictor, server.state.store)
    assert worker.run_once() is True

    r = client.get(f"/result/{job_id}")
    assert r.status_code == 200
    body = r.json()
    assert body["status"] == "COMPLETED"
    # Minimal payload: only the whitelisted keys.
    assert set(body["result"]) <= {
        "verdict", "is_real", "is_fake", "confidence",
        "manipulation_probability", "detail",
    }
    # Debug payload returns everything.
    r = client.get(f"/result/{job_id}?include_debug=true")
    assert "selection_margin" in r.json()["result"]


def test_job_result_404(client):
    assert client.get("/result/nonexistent").status_code == 404


def test_job_failure_is_persisted(server, client):
    r = client.post("/jobs", files=_upload_files())
    job_id = r.json()["job_id"]
    failing = FakePredictor(fail=True)
    worker = JobWorker(failing, server.state.store)
    worker.run_once()
    body = client.get(f"/result/{job_id}").json()
    assert body["status"] == "FAILED"
    assert "bad input video" in body["error"]


def test_metrics_evaluate_endpoint(client):
    evals = [
        {"predicted_is_fake": True, "true_is_fake": True},
        {"predicted_is_fake": True, "true_is_fake": False},
        {"predicted_is_fake": False, "true_is_fake": False},
        {"predicted_is_fake": False, "true_is_fake": True},
    ]
    r = client.post("/api/metrics/evaluate", json={"evaluations": evals})
    assert r.status_code == 200
    m = r.json()
    assert m["tp"] == 1 and m["fp"] == 1 and m["tn"] == 1 and m["fn"] == 1
    assert m["precision"] == 0.5 and m["recall"] == 0.5


def test_stale_processing_reclaim(tmp_path):
    """PROCESSING jobs older than the timeout get reclaimed
    (job_service.py:39-77)."""
    store = JobStore(str(tmp_path / "jobs.db"))
    job = store.create_job(tmp_path / "x.mp4")
    claimed = store.get_next_claimable_job()
    assert claimed.status == PROCESSING
    # Second claim with a huge timeout: nothing claimable.
    assert store.get_next_claimable_job(processing_timeout_sec=900) is None
    # With a zero timeout the stale PROCESSING row is reclaimable.
    time.sleep(0.01)
    reclaimed = store.get_next_claimable_job(processing_timeout_sec=0)
    assert reclaimed is not None and reclaimed.job_id == job.job_id


def test_multipart_parser_roundtrip():
    boundary = "XBOUNDARY"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="video_file"; '
        'filename="a.mp4"\r\n'
        "Content-Type: video/mp4\r\n\r\n"
    ).encode() + b"\x00\x01\x02binary\r\ndata" + (
        f"\r\n--{boundary}--\r\n"
    ).encode()
    parts = parse_multipart(
        body, f"multipart/form-data; boundary={boundary}"
    )
    assert parts["video_file"][0] == "a.mp4"
    assert parts["video_file"][1] == b"\x00\x01\x02binary\r\ndata"


def test_default_checkpoint_discovery(tmp_path, monkeypatch):
    # weights/flagship fallback + MODEL_PATH precedence
    # (utils/weights.default_checkpoint; reference weights contract,
    # config.py:83-94).
    from lipsync_tpu.utils import weights as w

    monkeypatch.delenv("MODEL_PATH", raising=False)
    monkeypatch.setattr(w, "FLAGSHIP_DIR", tmp_path / "flagship")
    assert w.default_checkpoint() is None

    (tmp_path / "flagship").mkdir()
    assert w.default_checkpoint() == tmp_path / "flagship"

    override = tmp_path / "override.pth"
    override.write_bytes(b"x")
    monkeypatch.setenv("MODEL_PATH", str(override))
    assert w.default_checkpoint() == override
    # A missing MODEL_PATH falls through to the shipped default.
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "nope.pth"))
    assert w.default_checkpoint() == tmp_path / "flagship"


def test_get_settings_flagship_fallback(tmp_path, monkeypatch):
    from lipsync_tpu.serving import config as cfg_mod
    from lipsync_tpu.utils import weights as w

    monkeypatch.delenv("MODEL_PATH", raising=False)
    flagship = tmp_path / "flagship"
    flagship.mkdir()
    flagship.with_suffix(".json").write_text(
        json.dumps({"calibration_platt_a": 0.8, "calibration_platt_b": 0.1})
    )
    monkeypatch.setattr(w, "FLAGSHIP_DIR", flagship)
    monkeypatch.chdir(tmp_path)  # reference default location absent
    s = cfg_mod.get_settings()
    assert s.model_path == flagship
    assert s.calibration_method == "platt"
    assert s.calibration_platt_a == 0.8

    # Explicit MODEL_PATH still wins and skips the shipped calibration.
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "other.pth"))
    s2 = cfg_mod.get_settings()
    assert s2.model_path == tmp_path / "other.pth"
    assert s2.calibration_method == "none"

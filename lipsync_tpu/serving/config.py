"""Service settings — same knobs/names/defaults as the reference
(`/root/reference/app/config.py:8-94`); they are part of the behavioral
contract (guards change verdicts). Env overrides: MODEL_PATH,
SQLITE_DB_URL.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from pydantic import BaseModel

from lipsync_tpu.inference.predictor import PredictorConfig


class Settings(BaseModel):
    project_name: str = "Lip Sync Detection Service"
    model_path: Path = Path("weights_finetune") / "best_model_accuracy.pth"
    device: str = "tpu"  # informational; JAX picks the platform
    confidence_threshold: float = 0.5
    use_bfloat16: bool = True  # replaces use_half_precision on TPU
    uncertainty_margin: float = 0.05
    confidence_smoothing: str = "median"
    trim_ratio: float = 0.1
    max_tracks: int = 6
    refine_margin: float = 0.08
    refine_top_k: int = 2
    chunk_size: int = 32
    chunk_stride: int = 8
    long_video_threshold_sec: float = 2.0
    max_total_frames: Optional[int] = None
    confidence_margin: float = 0.10
    calibration_method: str = "none"
    calibration_temperature: float = 1.0
    calibration_platt_a: float = 1.0
    calibration_platt_b: float = 0.0
    calibration_isotonic_path: Optional[str] = None
    mouth_motion_check: bool = True
    mouth_motion_low_threshold: float = 0.015
    mouth_motion_fake_penalty: float = 0.10
    audio_energy_high_threshold: float = -25.0
    audio_energy_low_threshold: float = -50.0
    weak_real_gate: float = 0.08
    weak_real_window_threshold: float = 0.30
    fake_vote_gate: float = 0.10
    fake_vote_min_windows: int = 5
    # TPU-rebuild knob (no reference analog): host detector stride for the
    # pipelined long-video path; see PredictorConfig.detection_stride.
    detection_stride: int = 1
    # TPU-rebuild knob (no reference analog): encode each track once and
    # gather per-window visual features (~2.8x fewer model FLOPs on long
    # videos); see PredictorConfig.shared_visual_encoding.
    shared_visual_encoding: bool = False
    # TPU-rebuild knob (no reference analog): shard the serving window batch
    # over the first N chips of a slice (0/1 = single chip).
    data_parallel_devices: int = 0
    # TPU-rebuild knob (no reference analog): int8 encoder convs on the
    # MXU; see PredictorConfig.quantized_int8.
    quantized_int8: bool = False
    # TPU-rebuild knob (no reference analog): compose the HF artifact
    # stem's Laplacian into conv1 at serving time; see
    # PredictorConfig.fold_hf_stem.
    fold_hf_stem: bool = False
    # TPU-rebuild knob (no reference analog): coalesce concurrent requests'
    # window batches into shared forwards (inference/batcher.py). The chip
    # is <5% utilized under concurrent load without it (BENCHMARKS.md
    # serving bench); the linger adds at most coalesce_max_wait_ms latency
    # per scoring call.
    coalesce_requests: bool = True
    coalesce_max_wait_ms: float = 2.0
    # TPU-rebuild knob (no reference analog): "articulation" replaces the
    # reference's motion<->audio correlation as the speaking-activity
    # signal so DUBBED faces still register as speaking tracks; see
    # PredictorConfig.speaking_score_mode and docs/SERVING.md.
    speaking_score_mode: str = "alignment"
    sqlite_db_path: str = "./jobs.db"
    run_embedded_worker: bool = True
    worker_poll_interval_sec: float = 1.0
    worker_processing_timeout_sec: int = 900
    host: str = "127.0.0.1"
    port: int = 8000

    def to_predictor_config(self) -> PredictorConfig:
        return PredictorConfig(
            confidence_threshold=self.confidence_threshold,
            uncertainty_margin=self.uncertainty_margin,
            confidence_smoothing=self.confidence_smoothing,
            trim_ratio=self.trim_ratio,
            max_tracks=self.max_tracks,
            refine_margin=self.refine_margin,
            refine_top_k=self.refine_top_k,
            chunk_size=self.chunk_size,
            chunk_stride=self.chunk_stride,
            long_video_threshold_sec=self.long_video_threshold_sec,
            max_total_frames=self.max_total_frames,
            confidence_margin=self.confidence_margin,
            calibration_method=self.calibration_method,
            calibration_temperature=self.calibration_temperature,
            calibration_platt_a=self.calibration_platt_a,
            calibration_platt_b=self.calibration_platt_b,
            calibration_isotonic_path=self.calibration_isotonic_path,
            mouth_motion_check=self.mouth_motion_check,
            mouth_motion_low_threshold=self.mouth_motion_low_threshold,
            mouth_motion_fake_penalty=self.mouth_motion_fake_penalty,
            audio_energy_high_threshold=self.audio_energy_high_threshold,
            audio_energy_low_threshold=self.audio_energy_low_threshold,
            weak_real_gate=self.weak_real_gate,
            weak_real_window_threshold=self.weak_real_window_threshold,
            fake_vote_gate=self.fake_vote_gate,
            fake_vote_min_windows=self.fake_vote_min_windows,
            detection_stride=self.detection_stride,
            shared_visual_encoding=self.shared_visual_encoding,
            data_parallel_devices=self.data_parallel_devices,
            quantized_int8=self.quantized_int8,
            fold_hf_stem=self.fold_hf_stem,
            speaking_score_mode=self.speaking_score_mode,
        )


def get_settings() -> Settings:
    """MODEL_PATH / SQLITE_DB_URL env overrides (config.py:83-94; the db
    url accepts both a bare path and a sqlite:/// url).

    When neither MODEL_PATH nor the reference-parity default location
    exists, the committed flagship checkpoint (weights/flagship, incl.
    its fitted Platt constants) is used — a fresh clone serves real
    verdicts with zero setup."""
    kwargs = {}
    if env_path := os.environ.get("MODEL_PATH"):
        kwargs["model_path"] = Path(env_path)
    else:
        from lipsync_tpu.utils.weights import (
            default_calibration,
            default_checkpoint,
        )

        default_loc = Settings.model_fields["model_path"].default
        if not Path(default_loc).exists():
            if shipped := default_checkpoint():
                kwargs["model_path"] = shipped
                if cal := default_calibration():
                    kwargs.update(cal)
    if db_url := os.environ.get("SQLITE_DB_URL"):
        kwargs["sqlite_db_path"] = db_url.replace("sqlite:///", "")
    return Settings(**kwargs)

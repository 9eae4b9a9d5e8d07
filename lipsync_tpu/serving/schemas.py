"""Response contracts — field-for-field the reference's pydantic models
(`/root/reference/app/api/schemas.py:9-167`, `job_schemas.py:7-26`).
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, List, Literal, Optional

from pydantic import BaseModel

VerdictType = Literal["real", "fake", "uncertain"]


class TrackResult(BaseModel):
    track_id: int
    is_real: bool
    is_fake: bool
    confidence: float
    manipulation_probability: float
    raw_confidence: Optional[float] = None
    stability: Optional[float] = None
    hits: Optional[int] = None
    total_frames: Optional[int] = None
    speaking_activity: Optional[float] = None
    selection_score: Optional[float] = None
    window_confidences: Optional[List[float]] = None
    consecutive_miss_max: Optional[int] = None
    # Mean mouth box over the track in source pixels (x1, y1, x2, y2) — a
    # diagnostic superset field the reference lacks (app/api/schemas.py:9-23)
    # for attributing tracks to subjects in multi-face scenes.
    bbox: Optional[List[float]] = None


class WindowResult(BaseModel):
    window_index: int
    frame_start: int
    frame_end: int
    time_start_sec: Optional[float] = None
    time_end_sec: Optional[float] = None
    selected_track_id: int
    confidence: float
    is_real: bool
    is_fake: bool


class SpeakerSegment(BaseModel):
    selected_track_id: int
    frame_start: int
    frame_end: int
    time_start_sec: Optional[float] = None
    time_end_sec: Optional[float] = None


class MouthMotionCheck(BaseModel):
    check_result: str
    audio_energy: Optional[float] = None
    mouth_motion_energy: Optional[float] = None


class LipSyncResponse(BaseModel):
    verdict: VerdictType
    is_real: bool
    is_fake: bool
    confidence: float
    manipulation_probability: float
    tracks: Optional[List[TrackResult]] = None
    selected_track_id: Optional[int] = None
    selection_uncertain: Optional[bool] = None
    selection_margin: Optional[float] = None
    confidence_margin_uncertain: Optional[bool] = None
    confidence_gap: Optional[float] = None
    turn_taking_detected: Optional[bool] = None
    speaker_case: Optional[str] = None
    speaking_tracks_count: Optional[int] = None
    speaking_real_count: Optional[int] = None
    speaking_fake_count: Optional[int] = None
    verdicts: Optional[Dict[str, bool]] = None
    window_results: Optional[List[WindowResult]] = None
    speaker_timeline: Optional[List[SpeakerSegment]] = None
    video_duration_sec: Optional[float] = None
    total_chunks_analyzed: Optional[int] = None
    mouth_motion_check: Optional[MouthMotionCheck] = None
    sparse_real_guard_applied: Optional[bool] = None
    mouth_motion_override_applied: Optional[bool] = None
    override_reason: Optional[str] = None
    temporal_confidence_drop: Optional[bool] = None
    temporal_drift: Optional[float] = None
    first_half_avg_confidence: Optional[float] = None
    second_half_avg_confidence: Optional[float] = None
    detail: Optional[str] = None

    @classmethod
    def from_result(cls, result: Dict[str, Any]) -> "LipSyncResponse":
        known = set(cls.model_fields)
        return cls(**{k: v for k, v in result.items() if k in known})


class EvaluationItem(BaseModel):
    predicted_is_fake: bool
    true_is_fake: bool
    video_id: Optional[str] = None


class BatchEvaluateRequest(BaseModel):
    evaluations: List[EvaluationItem]


class BatchEvaluateResponse(BaseModel):
    precision: float
    recall: float
    f1: float
    accuracy: float
    tp: int
    tn: int
    fp: int
    fn: int
    total: int


class PredictJobCreateResponse(BaseModel):
    job_id: str
    status: str
    created_at: datetime


class JobStatusResponse(BaseModel):
    job_id: str
    status: str
    input_path: str
    created_at: datetime
    updated_at: datetime
    error: Optional[str] = None


class JobResultResponse(BaseModel):
    job_id: str
    status: str
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None

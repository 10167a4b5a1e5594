"""API contract types (pydantic v2) — frozen per the reference contract.

Mirrors reference: audio-ident-service/app/schemas/{search,ingest,track,
pagination,errors,health,version}.py and docs/api-contract.md (v1.2.0).
Field names, casing (camelCase pagination), and enum values are contract-
frozen; the UI's generated client depends on them.
"""

from __future__ import annotations

from datetime import datetime
from enum import Enum
from typing import Any, Generic, TypeVar

from pydantic import BaseModel, Field


class SearchMode(str, Enum):
    EXACT = "exact"
    VIBE = "vibe"
    BOTH = "both"


class TrackInfo(BaseModel):
    id: str
    title: str
    artist: str | None = None
    album: str | None = None
    duration_seconds: float
    ingested_at: datetime


class TrackDetail(TrackInfo):
    sample_rate: int | None = None
    channels: int | None = None
    bitrate: int | None = None
    format: str | None = None
    file_hash_sha256: str
    file_size_bytes: int
    olaf_indexed: bool = False
    embedding_model: str | None = None
    embedding_dim: int | None = None
    updated_at: datetime


class ExactMatch(BaseModel):
    track: TrackInfo
    confidence: float = Field(ge=0.0, le=1.0)
    offset_seconds: float | None = None
    aligned_hashes: int
    # True when the score-gap verdict failed: the candidate passed the
    # frozen aligned-hash floor (the list the reference would return,
    # reference: app/search/exact.py:109-121) but the service does not
    # ASSERT a match.  Additive field — absent/false preserves the
    # reference contract's meaning exactly.
    low_confidence: bool = False


class VibeMatch(BaseModel):
    track: TrackInfo
    similarity: float
    embedding_model: str


class SearchResponse(BaseModel):
    request_id: str
    query_duration_ms: int
    exact_matches: list[ExactMatch]
    vibe_matches: list[VibeMatch]
    mode_used: SearchMode


class IngestStatus(str, Enum):
    INGESTED = "ingested"
    DUPLICATE = "duplicate"
    ERROR = "error"


class IngestResponse(BaseModel):
    track_id: str
    title: str
    artist: str | None = None
    status: IngestStatus


class IngestError(BaseModel):
    file: str
    error: str


class IngestReport(BaseModel):
    total: int
    ingested: int
    duplicates: int
    errors: list[IngestError]


class PaginationMeta(BaseModel):
    page: int
    pageSize: int
    totalItems: int
    totalPages: int


T = TypeVar("T")


class PaginatedResponse(BaseModel, Generic[T]):
    data: list[T]
    pagination: PaginationMeta


class ErrorDetail(BaseModel):
    code: str
    message: str
    details: Any | None = None


class ErrorResponse(BaseModel):
    error: ErrorDetail


class HealthResponse(BaseModel):
    status: str
    version: str


class VersionResponse(BaseModel):
    name: str
    version: str
    git_sha: str | None = None
    build_time: str | None = None


class StreamCreateResponse(BaseModel):
    """Streaming identification session (BASELINE config #3; the reference
    has no streaming mode — SURVEY.md §5 long-context)."""

    stream_id: str
    pcm_format: str  # "pcm_s16le" mono at sample_rate
    sample_rate: int
    window_sec: float
    hop_sec: float


class StreamMatch(BaseModel):
    track: TrackInfo
    carried_score: int
    confidence: float = Field(ge=0.0, le=1.0)
    offset_seconds: float  # stream start position within the track
    stream_position_sec: float  # audio consumed when confirmed


class StreamPushResponse(BaseModel):
    stream_id: str
    position_sec: float
    confirmed: bool
    match: StreamMatch | None = None

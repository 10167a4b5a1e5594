"""Streaming identification: sliding windows with carried vote state.

The reference has no streaming mode — its long-sequence mechanisms are
offline chunking (SURVEY.md §5 "long-context").  This implements the
BASELINE streaming configuration: a rolling window over a live PCM feed,
re-queried every hop against the device index, with per-track evidence
carried across windows so confidence accumulates while a track keeps
matching and decays when it stops.

Frozen semantics (v1):
- window = STREAM_WINDOW_SEC of the most recent audio, queried every
  STREAM_HOP_SEC once the buffer holds a full window;
- carried score: s_t(track) = floor(s_{t-1}(track) * STREAM_DECAY)
  + aligned_t(track); tracks whose carried score falls below 1 are
  dropped;
- a report fires when the leading track's carried score reaches
  STREAM_CONFIRM_HASHES and it leads the runner-up by STREAM_LEAD_RATIO;
- reported offset = the latest window's offset minus the stream position,
  i.e. where the stream started inside the reference track.

All state is tiny host-side dicts; only the per-window fingerprint+match
runs on the device (same compiled program for every window: one static
shape).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from audio_ident_tpu import spec
from audio_ident_tpu.index.match import DeviceIndex
from audio_ident_tpu.search.exact import ExactLane

STREAM_WINDOW_SEC = 5.0
STREAM_HOP_SEC = 2.5
STREAM_DECAY = 0.5
STREAM_CONFIRM_HASHES = spec.STRONG_MATCH_HASHES  # 20
STREAM_LEAD_RATIO = 2.0


@dataclass
class StreamReport:
    track_row: int
    carried_score: int
    confidence: float
    offset_seconds: float  # stream start position within the track
    stream_position_sec: float  # how much audio was consumed when confirmed


@dataclass
class StreamingIdentifier:
    """Feed PCM with ``push``; returns a StreamReport when confident.

    Construct with either a ``device_index`` (single chip) or a ready
    ``lane`` (e.g. a mesh-sharded ExactLane from EngineState).  A session
    pins the index generation it was created against; tracks ingested
    mid-stream become visible to NEW sessions only.
    """

    device_index: DeviceIndex | None = None
    lane: ExactLane | None = None
    sample_rate: int = spec.SAMPLE_RATE
    _buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    _consumed: int = 0  # samples consumed before the buffer start
    _next_query_at: int = 0  # absolute sample position of the next query
    _scores: dict[int, int] = field(default_factory=dict)
    _offsets: dict[int, float] = field(default_factory=dict)

    def __post_init__(self):
        if (self.device_index is None) == (self.lane is None):
            raise ValueError("provide exactly one of device_index or lane")
        self._lane = self.lane or ExactLane(self.device_index)
        self._window = int(STREAM_WINDOW_SEC * self.sample_rate)
        self._hop = int(STREAM_HOP_SEC * self.sample_rate)
        self._next_query_at = self._window

    @property
    def position_sec(self) -> float:
        return (self._consumed + len(self._buffer)) / self.sample_rate

    def push(self, pcm: np.ndarray) -> StreamReport | None:
        """Append audio; runs due window queries; returns a confident hit."""
        self._buffer = np.concatenate([self._buffer, pcm.astype(np.float32)])
        report = None
        while self._consumed + len(self._buffer) >= self._next_query_at:
            report = self._query_window(self._next_query_at) or report
            self._next_query_at += self._hop
            # drop audio older than one window behind the next query
            keep_from = self._next_query_at - self._window
            drop = keep_from - self._consumed
            if drop > 0:
                self._buffer = self._buffer[drop:]
                self._consumed = keep_from
        return report

    def _query_window(self, end_abs: int) -> StreamReport | None:
        start_abs = end_abs - self._window
        a = start_abs - self._consumed
        window = self._buffer[a : a + self._window]

        # same static shape every hop: one compiled program for the stream;
        # UNFILTERED candidates so weak per-window evidence can accumulate
        candidates = self._lane.candidates(window)

        decayed: dict[int, int] = {}
        for row, s in self._scores.items():
            ns = int(s * STREAM_DECAY)
            if ns >= 1:
                decayed[row] = ns
        for c in candidates:
            decayed[c.track_row] = decayed.get(c.track_row, 0) + c.aligned_hashes
            # window offset is the window start's position in the track;
            # rebase to the stream start
            self._offsets[c.track_row] = c.offset_seconds - start_abs / self.sample_rate
        self._scores = decayed

        if not self._scores:
            return None
        ranked = sorted(self._scores.items(), key=lambda kv: -kv[1])
        top_row, top_score = ranked[0]
        runner = ranked[1][1] if len(ranked) > 1 else 0
        if top_score >= STREAM_CONFIRM_HASHES and top_score >= STREAM_LEAD_RATIO * max(runner, 1):
            return StreamReport(
                track_row=top_row,
                carried_score=top_score,
                confidence=min(top_score / (2 * STREAM_CONFIRM_HASHES), 1.0),
                offset_seconds=self._offsets.get(top_row, 0.0),
                stream_position_sec=end_abs / self.sample_rate,
            )
        return None

    def reset(self) -> None:
        self._buffer = np.zeros(0, np.float32)
        self._consumed = 0
        self._next_query_at = self._window
        self._scores.clear()
        self._offsets.clear()

"""Chunk->track aggregation: Top-K average + diversity bonus.

Frozen scoring mirror of the reference (reference:
audio-ident-service/app/search/aggregation.py:63-138):
- base_score = mean of top-``top_k_per_track`` chunk scores per track;
- diversity_bonus = min(unique_offsets / 5, 1.0) * diversity_weight;
- final = base + bonus, sorted descending;
- optional exclusion of the exact-match track.

Host-side pure function: the input is the device top-k's ~50 hits, far too
small to justify a device program of its own.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

TOP_K_PER_TRACK = 3
DIVERSITY_WEIGHT = 0.05


@dataclass(frozen=True)
class TrackScore:
    track_row: int
    final_score: float
    base_score: float
    diversity_bonus: float
    chunk_count: int


def aggregate_chunk_hits(
    scores: np.ndarray,
    tracks: np.ndarray,
    offsets: np.ndarray,
    *,
    top_k_per_track: int = TOP_K_PER_TRACK,
    diversity_weight: float = DIVERSITY_WEIGHT,
    exclude_track_row: int | None = None,
) -> list[TrackScore]:
    """Aggregate device top-k hit arrays into ranked track scores."""
    results: list[TrackScore] = []
    valid = tracks >= 0
    for row in np.unique(tracks[valid]):
        if exclude_track_row is not None and row == exclude_track_row:
            continue
        sel = tracks == row
        s = np.sort(scores[sel])[::-1]
        top = s[:top_k_per_track]
        base = float(top.mean())
        unique_offsets = len(np.unique(offsets[sel]))
        bonus = min(unique_offsets / 5.0, 1.0) * diversity_weight
        results.append(
            TrackScore(
                track_row=int(row),
                final_score=base + bonus,
                base_score=base,
                diversity_bonus=bonus,
                chunk_count=int(sel.sum()),
            )
        )
    results.sort(key=lambda r: (-r.final_score, r.track_row))
    return results

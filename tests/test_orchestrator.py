"""Orchestrator failure-mode matrix with injected lanes (mirrors the
reference's endpoint failure tests, SURVEY.md §4 technique 7):
one-lane-fails -> partial results, both-fail -> unavailable,
both-timeout -> timeout, mixed timeout+failure -> unavailable."""

import asyncio

import pytest

from audio_ident_tpu.service.orchestrator import (
    SearchTimeoutError,
    SearchUnavailableError,
    orchestrate_search,
)
from audio_ident_tpu.service.schemas import (
    ExactMatch,
    SearchMode,
    TrackInfo,
    VibeMatch,
)

pytestmark = pytest.mark.anyio


def _track(i=0):
    return TrackInfo(
        id=f"00000000-0000-0000-0000-{i:012d}",
        title=f"t{i}",
        duration_seconds=10.0,
        ingested_at="2026-01-01T00:00:00+00:00",
    )


def _exact():
    return [ExactMatch(track=_track(), confidence=0.9, offset_seconds=1.0, aligned_hashes=18)]


def _vibe():
    return [VibeMatch(track=_track(1), similarity=0.8, embedding_model="clap")]


async def ok_exact():
    return _exact()


async def ok_vibe():
    return _vibe()


async def boom():
    raise RuntimeError("backend down")


async def hang():
    await asyncio.sleep(60)
    return []


async def test_both_lanes_succeed():
    r = await orchestrate_search(SearchMode.BOTH, ok_exact, ok_vibe)
    assert len(r.exact_matches) == 1
    assert len(r.vibe_matches) == 1
    assert r.mode_used == SearchMode.BOTH
    assert r.request_id


async def test_one_lane_fails_partial_results():
    r = await orchestrate_search(SearchMode.BOTH, ok_exact, boom)
    assert len(r.exact_matches) == 1
    assert r.vibe_matches == []


async def test_one_lane_times_out_partial_results():
    r = await orchestrate_search(
        SearchMode.BOTH, hang, ok_vibe, exact_timeout=0.05
    )
    assert r.exact_matches == []
    assert len(r.vibe_matches) == 1


async def test_both_fail_unavailable():
    with pytest.raises(SearchUnavailableError):
        await orchestrate_search(SearchMode.BOTH, boom, boom)


async def test_both_timeout():
    with pytest.raises(SearchTimeoutError):
        await orchestrate_search(
            SearchMode.BOTH, hang, hang, exact_timeout=0.05, vibe_timeout=0.05
        )


async def test_timeout_plus_failure_is_unavailable():
    with pytest.raises(SearchUnavailableError):
        await orchestrate_search(
            SearchMode.BOTH, hang, boom, exact_timeout=0.05
        )


async def test_exact_only_mode_ignores_vibe():
    r = await orchestrate_search(SearchMode.EXACT, ok_exact, boom)
    assert len(r.exact_matches) == 1
    assert r.vibe_matches == []
    assert r.mode_used == SearchMode.EXACT


async def test_no_lanes_unavailable():
    with pytest.raises(SearchUnavailableError):
        await orchestrate_search(SearchMode.VIBE, ok_exact, None)

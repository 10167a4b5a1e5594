"""C++ runtime kernels vs NumPy fallbacks: identical outputs, plus a
throughput sanity check (the native merge must beat lexsort at scale)."""

import time

import numpy as np
import pytest

from audio_ident_tpu import spec
from audio_ident_tpu.utils.native import (
    build_native,
    hamming_batch,
    merge_postings,
    native_lib,
    sort_postings,
)


@pytest.fixture(scope="module", autouse=True)
def built():
    if native_lib() is None and not build_native():
        pytest.skip("native toolchain unavailable")


def _rand_postings(n, rng, max_track=1000, max_time=100_000):
    return (
        rng.integers(0, spec.HASH_SPACE, n).astype(np.int32),
        rng.integers(0, max_track, n).astype(np.int32),
        rng.integers(0, max_time, n).astype(np.int32),
    )


def test_sort_postings_matches_lexsort():
    rng = np.random.default_rng(0)
    h, r, t = _rand_postings(100_000, rng)
    hs, rs, ts = sort_postings(h, r, t)
    order = np.lexsort((t, r, h))
    np.testing.assert_array_equal(hs, h[order])
    np.testing.assert_array_equal(rs, r[order])
    np.testing.assert_array_equal(ts, t[order])


def test_merge_postings_matches_numpy():
    rng = np.random.default_rng(1)
    h_a, r_a, t_a = (x for x in sort_postings(*_rand_postings(50_000, rng)))
    h_b, r_b, t_b = (x for x in sort_postings(*_rand_postings(20_000, rng)))
    track_valid = rng.random(1000) > 0.1

    r1, t1, off1 = merge_postings(h_a, r_a, t_a, h_b, r_b, t_b, track_valid)

    # NumPy oracle
    h = np.concatenate([h_a, h_b]).astype(np.int64)
    r = np.concatenate([r_a, r_b])
    t = np.concatenate([t_a, t_b])
    live = track_valid[r]
    h, r, t = h[live], r[live], t[live]
    order = np.lexsort((t, r, h))
    np.testing.assert_array_equal(r1, r[order])
    np.testing.assert_array_equal(t1, t[order])
    counts = np.bincount(h, minlength=spec.HASH_SPACE)
    expect_off = np.zeros(spec.HASH_SPACE + 1, np.int64)
    np.cumsum(counts, out=expect_off[1:])
    np.testing.assert_array_equal(off1, expect_off)


def test_native_sort_faster_than_lexsort_at_scale():
    rng = np.random.default_rng(2)
    h, r, t = _rand_postings(3_000_000, rng)
    t0 = time.perf_counter()
    sort_postings(h, r, t)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.lexsort((t, r, h))
    numpy_t = time.perf_counter() - t0
    assert native_t < numpy_t, f"native {native_t:.3f}s vs numpy {numpy_t:.3f}s"


def test_hamming_batch_matches_reference():
    from audio_ident_tpu.ops.content_fp import fingerprint_similarity

    rng = np.random.default_rng(3)
    q = rng.integers(0, 2**32, 200, dtype=np.uint32)
    cands = [
        rng.integers(0, 2**32, n, dtype=np.uint32) for n in (200, 150, 300, 0)
    ]
    got = hamming_batch(q, cands)
    want = [fingerprint_similarity(q, c) for c in cands]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_index_uses_native_merge():
    """End-to-end: FingerprintIndex compaction produces identical query
    results with the native path (the match-parity suite covers numpy)."""
    from audio_ident_tpu.index.store import FingerprintIndex

    rng = np.random.default_rng(4)
    idx = FingerprintIndex(max_tracks=1 << 10)
    for i in range(4):
        n = 5000
        idx.add_track(
            f"00000000-0000-0000-0000-{i:012d}",
            rng.integers(0, spec.HASH_SPACE, n).astype(np.int64),
            rng.integers(0, 50_000, n).astype(np.int32),
        )
    idx.merge_delta()
    assert len(idx.tracks) == 20_000
    assert idx.offsets[-1] == 20_000
    assert idx.delete_track("00000000-0000-0000-0000-000000000002")
    idx.merge_delta()
    assert len(idx.tracks) == 15_000


def test_autobuild_on_first_use(tmp_path, monkeypatch):
    """A missing .so triggers ONE in-process compile on first native_lib()
    call (fresh checkouts must not silently run the 3.5x-slower NumPy
    fallbacks), and the result lands via atomic rename."""
    from audio_ident_tpu.utils import native as nat

    monkeypatch.setattr(nat, "_LIB_PATH", tmp_path / "libaudioident.so")
    monkeypatch.setattr(nat, "_AUTOBUILD_TRIED", False)
    nat.native_lib.cache_clear()
    try:
        lib = nat.native_lib()
        assert lib is not None
        assert (tmp_path / "libaudioident.so").exists()
        # no half-written temp artifacts left behind
        assert not list(tmp_path.glob(".libaudioident.*"))
    finally:
        nat.native_lib.cache_clear()


def _build_index(rng, n_tracks=24, tombstone_every=5, time_max=100_000):
    from audio_ident_tpu.index.store import FingerprintIndex

    idx = FingerprintIndex(max_tracks=1 << 10)
    for i in range(n_tracks):
        n = int(rng.integers(500, 3000))
        idx.add_track(
            f"00000000-0000-0000-0000-{i:012d}",
            rng.integers(0, spec.HASH_SPACE, n).astype(np.int64),
            rng.integers(0, time_max, n).astype(np.int32),
        )
    # split state across all three tiers: main CSR, sorted delta, pending
    idx.merge_delta()
    for i in range(n_tracks, n_tracks + 8):
        n = int(rng.integers(500, 3000))
        idx.add_track(
            f"00000000-0000-0000-0000-{i:012d}",
            rng.integers(0, spec.HASH_SPACE, n).astype(np.int64),
            rng.integers(0, time_max, n).astype(np.int32),
        )
    idx.flush()  # -> sorted delta
    for i in range(n_tracks + 8, n_tracks + 14):
        n = int(rng.integers(500, 3000))
        idx.add_track(
            f"00000000-0000-0000-0000-{i:012d}",
            rng.integers(0, spec.HASH_SPACE, n).astype(np.int64),
            rng.integers(0, time_max, n).astype(np.int32),
        )  # -> unsorted pending
    for i in range(0, n_tracks + 14, tombstone_every):
        idx.delete_track(f"00000000-0000-0000-0000-{i:012d}")
    return idx


@pytest.mark.fast
def test_ranged_merge_bit_identical_to_whole_merge():
    """compute_ranged_merge (bounded-memory compaction, r4 verdict item 5)
    must produce BIT-IDENTICAL arrays to the legacy flush+whole-CSR merge,
    across main+delta+pending tiers and tombstones, at every range count
    (budget forces 1, a few, and many hash-range passes)."""
    from audio_ident_tpu.index.store import compute_ranged_merge
    from audio_ident_tpu.utils.native import merge_postings_csr

    rng = np.random.default_rng(7)
    idx = _build_index(rng)

    # legacy oracle: full flush + single CSR merge
    import copy

    legacy = copy.deepcopy(idx)
    legacy.flush()
    r0, t0, off0 = merge_postings_csr(
        legacy.offsets, legacy.tracks, legacy.times,
        legacy.d_hash, legacy.d_track, legacy.d_time,
        legacy.track_valid,
    )

    for budget in (None, 1 << 30, 200_000, 20_000):
        inputs = idx.capture_merge_inputs()
        off1, r1, t1 = compute_ranged_merge(inputs, budget)
        np.testing.assert_array_equal(r1, r0)
        np.testing.assert_array_equal(t1, t0)
        np.testing.assert_array_equal(off1, off0)


@pytest.mark.fast
def test_consolidate_pending_preserves_merge_output():
    """Destructive pending consolidation (bulk-rebuild path) must not
    change the compaction result, and merge_delta with a tiny budget must
    equal merge_delta with the default."""
    import copy

    rng = np.random.default_rng(8)
    idx = _build_index(rng)
    twin = copy.deepcopy(idx)

    assert idx.pending_bytes > 0
    n_before = idx.delta_count
    idx.consolidate_pending(run_postings=4000)  # force several runs
    assert idx.delta_count == n_before
    assert len(idx._pending) > 1  # actually produced multiple sorted runs
    idx.merge_delta(budget_bytes=50_000)
    twin.merge_delta()

    np.testing.assert_array_equal(idx.tracks, twin.tracks)
    np.testing.assert_array_equal(idx.times, twin.times)
    np.testing.assert_array_equal(idx.offsets, twin.offsets)
    assert idx.delta_count == 0 and len(idx._pending) == 0


@pytest.mark.fast
def test_merge_csr_range_covers_full_space():
    """Stitching every range pass equals the unranged kernel output."""
    from audio_ident_tpu.utils.native import merge_csr_range, merge_postings_csr

    rng = np.random.default_rng(9)
    h_a, r_a, t_a = sort_postings(*_rand_postings(40_000, rng))
    counts = np.bincount(h_a, minlength=spec.HASH_SPACE)
    offsets_a = np.zeros(spec.HASH_SPACE + 1, np.int64)
    np.cumsum(counts, out=offsets_a[1:])
    h_b, r_b, t_b = sort_postings(*_rand_postings(15_000, rng))
    track_valid = rng.random(1000) > 0.15

    r0, t0, off0 = merge_postings_csr(
        offsets_a, r_a, t_a, h_b, r_b, t_b, track_valid)

    n_ranges = 16
    shift = spec.HASH_BITS - 4
    r1 = np.empty(len(r0), np.int32)
    t1 = np.empty(len(t0), np.int32)
    off1 = np.zeros(spec.HASH_SPACE + 1, np.int64)
    cursor = 0
    db = np.searchsorted(
        h_b, (np.arange(n_ranges + 1, dtype=np.int64) << shift))
    for k in range(n_ranges):
        lo, hi = k << shift, (k + 1) << shift
        view = off1[lo + 1: hi + 1]
        n = merge_csr_range(
            offsets_a, r_a, t_a,
            h_b[db[k]:db[k + 1]], r_b[db[k]:db[k + 1]], t_b[db[k]:db[k + 1]],
            track_valid, lo, hi, r1[cursor:], t1[cursor:], view,
        )
        view += cursor
        cursor += n
    np.testing.assert_array_equal(r1, r0)
    np.testing.assert_array_equal(t1, t0)
    np.testing.assert_array_equal(off1, off0)

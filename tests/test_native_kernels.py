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

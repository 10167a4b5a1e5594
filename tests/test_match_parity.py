"""Index + matcher: CPU-golden vs device parity, end-to-end identification.

Mirrors the reference's scoring-logic unit tests (SURVEY.md §4 technique 6)
but at the engine level: build a small library, query clips, and require the
device matcher to agree with the frozen NumPy semantics.
"""

import numpy as np
import pytest

# <5 min smoke tier: `make test-fast` / pytest -m fast (r3 verdict item 9)
pytestmark = pytest.mark.fast

from audio_ident_tpu import spec
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
from audio_ident_tpu.cpu_reference.match import match_votes_np
from audio_ident_tpu.index.match import DeviceIndex, match_device
from audio_ident_tpu.index.store import FingerprintIndex

from tests.conftest import synth_audio


def _build_library(n_tracks=8, seconds=30.0, seed0=100):
    idx = FingerprintIndex(max_tracks=1 << 12)
    audios = []
    for i in range(n_tracks):
        x = synth_audio(np.random.default_rng(seed0 + i), seconds)
        audios.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}", h, t, v)
    return idx, audios


def _match_np(idx, q_hash, q_time, q_valid):
    idx.flush()
    return match_votes_np(
        q_hash.astype(np.int64), q_time, q_valid,
        idx.offsets, idx.tracks, idx.times,
        idx.d_hash, idx.d_track, idx.d_time, len(idx.d_hash),
        idx.track_valid,
    )


def _match_dev(idx, q_hash, q_time, q_valid):
    di = DeviceIndex.from_host(idx)
    t, a, o = match_device(
        q_hash.astype(np.int32), q_time.astype(np.int32), q_valid, di
    )
    return np.asarray(t), np.asarray(a), np.asarray(o)


@pytest.fixture(scope="module")
def library():
    return _build_library()


def _query_fp(x):
    h, t, v = fingerprint_np(x)
    return h.astype(np.int64), t, v


def test_identify_clip_from_library(library):
    idx, audios = library
    # 8s clip out of track 3 starting at 12s
    clip = audios[3][12 * 16000 : 20 * 16000]
    qh, qt, qv = _query_fp(clip)
    res = _match_np(idx, qh, qt, qv)
    assert res.track[0] == 3
    assert res.aligned[0] >= spec.MIN_ALIGNED_HASHES
    assert abs(res.offset_sec[0] - 12.0) < 0.5

    dt_, da, do = _match_dev(idx, qh, qt, qv)
    assert dt_[0] == 3
    assert da[0] == res.aligned[0]
    assert abs(do[0] - res.offset_sec[0]) < 1e-3


def test_device_matches_golden_exactly(library):
    idx, audios = library
    for trk in [0, 5]:
        for start in [0, 7]:
            clip = audios[trk][start * 16000 : (start + 6) * 16000]
            qh, qt, qv = _query_fp(clip)
            res = _match_np(idx, qh, qt, qv)
            t, a, o = _match_dev(idx, qh, qt, qv)
            np.testing.assert_array_equal(t, res.track)
            np.testing.assert_array_equal(a, res.aligned)
            np.testing.assert_allclose(o, res.offset_sec, atol=1e-3)


def test_noisy_clip_still_matches(library):
    idx, audios = library
    rng = np.random.default_rng(7)
    clip = audios[6][5 * 16000 : 11 * 16000].copy()
    clip += (0.35 * clip.std() * rng.standard_normal(len(clip))).astype(np.float32)
    qh, qt, qv = _query_fp(clip)
    res = _match_np(idx, qh, qt, qv)
    assert res.track[0] == 6
    t, a, o = _match_dev(idx, qh, qt, qv)
    np.testing.assert_array_equal(t, res.track)
    np.testing.assert_array_equal(a, res.aligned)


def test_unrelated_audio_below_threshold(library):
    idx, _ = library
    x = synth_audio(np.random.default_rng(999), 6.0)
    qh, qt, qv = _query_fp(x)
    res = _match_np(idx, qh, qt, qv)
    assert res.aligned[0] < spec.MIN_ALIGNED_HASHES
    t, a, o = _match_dev(idx, qh, qt, qv)
    np.testing.assert_array_equal(a, res.aligned)


def test_delete_track_tombstone(library):
    idx, audios = _build_library(n_tracks=4, seconds=20.0, seed0=300)
    clip = audios[2][4 * 16000 : 10 * 16000]
    qh, qt, qv = _query_fp(clip)
    assert _match_np(idx, qh, qt, qv).track[0] == 2
    assert idx.delete_track("00000000-0000-0000-0000-000000000002")
    res = _match_np(idx, qh, qt, qv)
    assert 2 not in res.track[res.aligned >= spec.MIN_ALIGNED_HASHES]
    t, a, o = _match_dev(idx, qh, qt, qv)
    np.testing.assert_array_equal(t, res.track)
    # merge compaction drops tombstoned postings and preserves results
    idx.merge_delta()
    res2 = _match_np(idx, qh, qt, qv)
    assert 2 not in res2.track[res2.aligned >= spec.MIN_ALIGNED_HASHES]


def test_delta_vs_merged_equivalence(library):
    idx, audios = _build_library(n_tracks=4, seconds=20.0, seed0=400)
    clip = audios[1][2 * 16000 : 8 * 16000]
    qh, qt, qv = _query_fp(clip)
    before = _match_np(idx, qh, qt, qv)
    idx.merge_delta()
    after = _match_np(idx, qh, qt, qv)
    np.testing.assert_array_equal(before.track, after.track)
    np.testing.assert_array_equal(before.aligned, after.aligned)
    t, a, o = _match_dev(idx, qh, qt, qv)
    np.testing.assert_array_equal(t, after.track)
    np.testing.assert_array_equal(a, after.aligned)


def test_snapshot_roundtrip(tmp_path, library):
    idx, audios = _build_library(n_tracks=3, seconds=15.0, seed0=500)
    clip = audios[0][1 * 16000 : 7 * 16000]
    qh, qt, qv = _query_fp(clip)
    before = _match_np(idx, qh, qt, qv)
    idx.save(tmp_path / "snap")
    idx2 = FingerprintIndex.load(tmp_path / "snap")
    after = _match_np(idx2, qh, qt, qv)
    np.testing.assert_array_equal(before.track, after.track)
    np.testing.assert_array_equal(before.aligned, after.aligned)
    assert idx2.uuid_of(0) == "00000000-0000-0000-0000-000000000000"


def test_empty_index_query():
    idx = FingerprintIndex(max_tracks=64)
    x = synth_audio(np.random.default_rng(1), 5.0)
    qh, qt, qv = _query_fp(x)
    res = _match_np(idx, qh, qt, qv)
    assert (res.track == -1).all()
    t, a, o = _match_dev(idx, qh, qt, qv)
    np.testing.assert_array_equal(t, res.track)


def test_incremental_mirror_reuses_main_tier_and_stays_exact():
    """Between compactions, DeviceIndex.from_host(prev=...) must reuse the
    resident main-tier device arrays (no multi-GB re-upload per ingest —
    the serving-under-ingest fix) while producing BIT-IDENTICAL match
    results to a from-scratch mirror; after a compaction it must rebuild."""
    from audio_ident_tpu.index.match import match_device

    idx, audios = _build_library(n_tracks=5)
    idx.merge_delta()
    base = DeviceIndex.from_host(idx)

    # churn: new track into the delta, one deletion (tombstone only)
    extra = synth_audio(np.random.default_rng(4242), 30.0)
    h, t, v = fingerprint_np(extra)
    row_new = idx.add_track("00000000-0000-0000-0000-00000000fffe", h, t, v)
    idx.delete_track("00000000-0000-0000-0000-000000000001")

    inc = DeviceIndex.from_host(idx, prev=base)
    full = DeviceIndex.from_host(idx)
    # main tier is literally the same device buffers
    assert inc.tracks is base.tracks and inc.times is base.times
    assert inc.offsets is base.offsets and inc.merge_gen == base.merge_gen
    # results identical to the from-scratch mirror, including the fresh
    # delta track and the tombstoned one
    for q_audio, want in (
        (extra[: 8 * spec.SAMPLE_RATE], row_new),
        (audios[2][: 8 * spec.SAMPLE_RATE], 2),
    ):
        qh, qt, qv = _query_fp(q_audio)
        r_inc = [np.asarray(a) for a in match_device(
            qh.astype(np.int32), qt.astype(np.int32), qv, inc)]
        r_full = [np.asarray(a) for a in match_device(
            qh.astype(np.int32), qt.astype(np.int32), qv, full)]
        for a, b in zip(r_inc, r_full):
            np.testing.assert_array_equal(a, b)
        assert int(r_inc[0][0]) == want
    # deleted track filtered through the re-uploaded tombstones
    qh, qt, qv = _query_fp(audios[1][: 8 * spec.SAMPLE_RATE])
    r = [np.asarray(a) for a in match_device(
        qh.astype(np.int32), qt.astype(np.int32), qv, inc)]
    assert int(r[0][0]) != 1

    # compaction bumps the generation -> full rebuild, fresh buffers
    idx.merge_delta()
    rebuilt = DeviceIndex.from_host(idx, prev=inc)
    assert rebuilt.merge_gen == idx.merge_gen != inc.merge_gen
    assert rebuilt.tracks is not inc.tracks


def test_incremental_sharded_mirror_bit_identical():
    """Sharded twin of the incremental-mirror test: delta-only updates on
    the mesh must match a from-scratch sharded mirror bit-for-bit."""
    import jax

    from audio_ident_tpu.parallel import (
        ShardedDeviceIndex,
        make_index_mesh,
        sharded_match,
    )

    cpu_mesh = make_index_mesh(jax.devices()[:8])
    idx, audios = _build_library(n_tracks=5, seed0=300)
    idx.merge_delta()
    base = ShardedDeviceIndex.from_host(idx, cpu_mesh)

    extra = synth_audio(np.random.default_rng(777), 30.0)
    h, t, v = fingerprint_np(extra)
    row_new = idx.add_track("00000000-0000-0000-0000-00000000fffd", h, t, v)
    idx.flush()

    inc = ShardedDeviceIndex.from_host(idx, cpu_mesh, prev=base)
    full = ShardedDeviceIndex.from_host(idx, cpu_mesh)
    assert inc.tracks is base.tracks and inc.offsets is base.offsets

    qh, qt, qv = _query_fp(extra[: 8 * spec.SAMPLE_RATE])
    r_inc = [np.asarray(a) for a in sharded_match(
        qh.astype(np.int32), qt.astype(np.int32), qv, inc, cpu_mesh)]
    r_full = [np.asarray(a) for a in sharded_match(
        qh.astype(np.int32), qt.astype(np.int32), qv, full, cpu_mesh)]
    for a, b in zip(r_inc, r_full):
        np.testing.assert_array_equal(a, b)
    assert int(r_inc[0][0]) == row_new

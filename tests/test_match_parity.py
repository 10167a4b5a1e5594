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

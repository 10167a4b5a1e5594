"""Sharded matcher parity on a virtual 8-device CPU mesh.

The reference offers no distributed-test pattern (SURVEY.md §4); ours is:
shard the index over N virtual devices and require bit-identical results to
the single-chip matcher (which itself is parity-tested against the NumPy
golden reference).
"""

import jax
import numpy as np
import pytest

from audio_ident_tpu import spec
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
from audio_ident_tpu.index.match import DeviceIndex, match_device
from audio_ident_tpu.index.store import FingerprintIndex
from audio_ident_tpu.parallel import ShardedDeviceIndex, make_index_mesh, sharded_match

from tests.conftest import synth_audio


@pytest.fixture(scope="module")
def library():
    idx = FingerprintIndex(max_tracks=1 << 12)
    audios = []
    for i in range(6):
        x = synth_audio(np.random.default_rng(600 + i), 20.0)
        audios.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}", h, t, v)
    # half merged into the main CSR, half left in the delta: both paths probed
    idx.merge_delta()
    for i in range(6, 9):
        x = synth_audio(np.random.default_rng(600 + i), 20.0)
        audios.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}", h, t, v)
    return idx, audios


def _q(audios, trk, a, b):
    h, t, v = fingerprint_np(audios[trk][a * 16000 : b * 16000])
    return h.astype(np.int32), t.astype(np.int32), v


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_match_parity(library, n_dev):
    idx, audios = library
    mesh = make_index_mesh(jax.devices()[:n_dev])
    sdi = ShardedDeviceIndex.from_host(idx, mesh)
    di = DeviceIndex.from_host(idx)

    for trk, a, b in [(2, 4, 10), (7, 1, 7), (0, 0, 6)]:
        qh, qt, qv = _q(audios, trk, a, b)
        st, sa, so = sharded_match(qh, qt, qv, sdi, mesh)
        dt_, da, do = match_device(qh, qt, qv, di)
        np.testing.assert_array_equal(np.asarray(st), np.asarray(dt_))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(da))
        np.testing.assert_allclose(np.asarray(so), np.asarray(do), atol=1e-3)
        assert int(np.asarray(st)[0]) == trk
        assert int(np.asarray(sa)[0]) >= spec.MIN_ALIGNED_HASHES


def test_sharded_match_foreign_audio(library):
    idx, _ = library
    mesh = make_index_mesh(jax.devices()[:8])
    sdi = ShardedDeviceIndex.from_host(idx, mesh)
    x = synth_audio(np.random.default_rng(31337), 6.0)
    h, t, v = fingerprint_np(x)
    st, sa, _ = sharded_match(h.astype(np.int32), t.astype(np.int32), v, sdi, mesh)
    di = DeviceIndex.from_host(idx)
    _, da, _ = match_device(h.astype(np.int32), t.astype(np.int32), v, di)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(da))

"""Sharded vector top-k parity vs the single-device exact search on the
virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from audio_ident_tpu.parallel.sharded_vectors import (
    ShardedVectorIndex,
    make_index_mesh,
    sharded_vector_topk,
)
from audio_ident_tpu.vector.search import DeviceVectorIndex, vector_topk
from audio_ident_tpu.vector.store import VectorStore


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(0)
    vs = VectorStore(dim=32)
    for row in range(10):
        e = rng.standard_normal((40, 32)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        vs.add_track(row, e, np.arange(40, dtype=np.float32) * 5.0)
    vs.flush()
    return vs


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_topk_matches_single_device(store, n_dev):
    mesh = make_index_mesh(jax.devices()[:n_dev])
    svi = ShardedVectorIndex.from_host(store, mesh)
    dvi = DeviceVectorIndex.from_host(store)
    q = store.embeddings[123]
    ss, st, so, sc = (np.asarray(a) for a in sharded_vector_topk(q, svi, mesh, 20))
    ds, dt, do, dc = (np.asarray(a) for a in vector_topk(q, dvi, 20))
    np.testing.assert_allclose(np.sort(ss)[::-1], np.sort(ds)[::-1], atol=1e-5)
    assert st[0] == dt[0]  # self-match wins on both
    assert abs(ss[0] - 1.0) < 1e-5


def test_sharded_topk_tombstones(store):
    mesh = make_index_mesh(jax.devices()[:4])
    track_valid = np.ones(16, bool)
    track_valid[3] = False
    svi = ShardedVectorIndex.from_host(store, mesh, track_valid=track_valid)
    q = store.embeddings[3 * 40 + 5]  # a chunk of the tombstoned track
    _, st, _, _ = (np.asarray(a) for a in sharded_vector_topk(q, svi, mesh, 30))
    assert 3 not in st[st >= 0]

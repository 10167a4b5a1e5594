"""Row-sharded embedding matrix over the mesh: distributed cosine top-k.

The embedding matrix shards by chunk row (the natural data-parallel axis,
SURVEY.md §2 row 7's "on-device sharded embedding matrix"): each device
scores its rows with one local MXU matmul and takes a local top-k; the
tiny [D, limit] candidate lists all_gather over ICI and every device
re-ranks them to the global top-k, so the result is replicated and equals
the single-device exact search (same score set; ties may permute).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from audio_ident_tpu.parallel.sharded_index import SHARD_AXIS, make_index_mesh

__all__ = ["ShardedVectorIndex", "sharded_vector_topk", "make_index_mesh"]


@dataclass
class ShardedVectorIndex:
    """[D, rows/D, ...] mesh-sharded mirror of a VectorStore."""

    embeddings: jax.Array  # f32 [D, cap, dim]
    track: jax.Array  # int32 [D, cap] (-1 padding)
    offset_sec: jax.Array  # f32 [D, cap]
    chunk_index: jax.Array  # int32 [D, cap]
    version: int = -1

    @classmethod
    def from_host(cls, vs, mesh: Mesh, track_valid: np.ndarray | None = None):
        vs.flush()
        emb, trk = vs.embeddings, vs.track
        off, ci = vs.offset_sec, vs.chunk_index
        if track_valid is not None and len(trk):
            keep = track_valid[np.clip(trk, 0, len(track_valid) - 1)]
            emb, trk, off, ci = emb[keep], trk[keep], off[keep], ci[keep]
        d = mesh.devices.size
        n = len(trk)
        per = max(128, -(-max(n, 1) // d))  # ceil rows per shard, min 128
        cap = d * per
        pe = np.zeros((cap, vs.dim), np.float32)
        pe[:n] = emb
        pt = np.full(cap, -1, np.int32)
        pt[:n] = trk
        po = np.zeros(cap, np.float32)
        po[:n] = off
        pc = np.zeros(cap, np.int32)
        pc[:n] = ci
        shard = NamedSharding(mesh, P(SHARD_AXIS))
        put = functools.partial(jax.device_put, device=shard)
        return cls(
            embeddings=put(pe.reshape(d, per, vs.dim)),
            track=put(pt.reshape(d, per)),
            offset_sec=put(po.reshape(d, per)),
            chunk_index=put(pc.reshape(d, per)),
            version=vs.version,
        )


jax.tree_util.register_dataclass(
    ShardedVectorIndex,
    data_fields=["embeddings", "track", "offset_sec", "chunk_index"],
    meta_fields=["version"],
)


@functools.lru_cache(maxsize=8)
def _sharded_topk_fn(mesh: Mesh, limit: int):
    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None),
            (P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        ),
        out_specs=(P(None), P(None), P(None), P(None)),
        check_rep=False,
    )
    def topk(query, shards):
        emb, trk, off, ci = (a[0] for a in shards)
        scores = jnp.dot(emb, query, precision=jax.lax.Precision.HIGHEST)
        scores = jnp.where(trk >= 0, scores, -jnp.inf)
        k = min(limit, scores.shape[0])
        ls, li = jax.lax.top_k(scores, k)
        cand = (ls, trk[li], off[li], ci[li])
        # merge the tiny candidate lists over ICI; every device re-ranks
        gs, gt, go, gc = (
            jax.lax.all_gather(a, SHARD_AXIS).reshape(-1) for a in cand
        )
        ts, ti = jax.lax.top_k(gs, limit)
        good = jnp.isfinite(ts)
        return (
            jnp.where(good, ts, 0.0),
            jnp.where(good, gt[ti], -1),
            jnp.where(good, go[ti], 0.0),
            jnp.where(good, gc[ti], 0),
        )

    return topk


def sharded_vector_topk(query, svi: ShardedVectorIndex, mesh: Mesh, limit: int = 50):
    """Replicated (score, track, offset, chunk_index) arrays of [limit]."""
    shards = (svi.embeddings, svi.track, svi.offset_sec, svi.chunk_index)
    return _sharded_topk_fn(mesh, limit)(jnp.asarray(query, jnp.float32), shards)

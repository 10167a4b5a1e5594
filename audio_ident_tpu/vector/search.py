"""Device cosine top-k over the embedding matrix.

Replaces the reference's Qdrant HNSW query (top-50, hnsw_ef=128,
reference: app/search/vibe.py:164-218) with an EXACT batched matmul top-k:
scores = E @ q on the MXU, tombstone masking, ``jax.lax.top_k``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DeviceVectorIndex:
    """Capacity-padded device mirror of a VectorStore."""

    embeddings: jax.Array  # f32 [cap, dim]
    track: jax.Array  # int32 [cap] (-1 padding)
    offset_sec: jax.Array  # f32 [cap]
    chunk_index: jax.Array  # int32 [cap]
    n: jax.Array  # int32 scalar
    version: int = -1

    @classmethod
    def from_host(cls, vs, track_valid: np.ndarray | None = None, device=None):
        """Mirror a VectorStore; optionally drop tombstoned tracks' rows."""
        vs.flush()
        emb, trk = vs.embeddings, vs.track
        off, ci = vs.offset_sec, vs.chunk_index
        if track_valid is not None and len(trk):
            keep = track_valid[np.clip(trk, 0, len(track_valid) - 1)]
            emb, trk, off, ci = emb[keep], trk[keep], off[keep], ci[keep]
        n = len(trk)
        cap = max(1024, 1 << int(np.ceil(np.log2(max(n, 1)))))
        put = functools.partial(jax.device_put, device=device)
        pad_emb = np.zeros((cap, vs.dim), np.float32)
        pad_emb[:n] = emb
        pad_i = np.full(cap, -1, np.int32)
        pad_i[:n] = trk
        pad_o = np.zeros(cap, np.float32)
        pad_o[:n] = off
        pad_c = np.zeros(cap, np.int32)
        pad_c[:n] = ci
        return cls(
            embeddings=put(pad_emb),
            track=put(pad_i),
            offset_sec=put(pad_o),
            chunk_index=put(pad_c),
            n=put(np.int32(n)),
            version=vs.version,
        )


jax.tree_util.register_dataclass(
    DeviceVectorIndex,
    data_fields=["embeddings", "track", "offset_sec", "chunk_index", "n"],
    meta_fields=["version"],
)


@functools.partial(jax.jit, static_argnames=("limit",))
def vector_topk(query: jnp.ndarray, dvi: DeviceVectorIndex, limit: int = 50):
    """Unit-norm query [dim] -> (score[limit], track[limit], offset[limit],
    chunk_index[limit]); padding rows score -inf and surface track=-1."""
    scores = jnp.dot(
        dvi.embeddings, query, precision=jax.lax.Precision.HIGHEST
    )
    idx = jnp.arange(dvi.track.shape[0])
    valid = (idx < dvi.n) & (dvi.track >= 0)
    scores = jnp.where(valid, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(scores, limit)
    good = jnp.isfinite(top_s)
    return (
        jnp.where(good, top_s, 0.0),
        jnp.where(good, dvi.track[top_i], -1),
        jnp.where(good, dvi.offset_sec[top_i], 0.0),
        jnp.where(good, dvi.chunk_index[top_i], 0),
    )

"""Int8 scalar-quantized vector search (Qdrant scalar-quantization parity).

The reference configures its Qdrant collection with int8 scalar
quantization — quantile 0.99, ``always_ram: true`` — and Qdrant serves the
ANN pass over the int8 codes, rescoring the oversampled candidate set with
the original f32 vectors (reference: app/audio/qdrant_setup.py:50-77;
rationale docs/research/01-initial-research/03-embeddings-and-qdrant.md:225-239).

TPU-native equivalent, same two-phase design:

1. **Preselect on-device over int8 codes.**  The code matrix lives in HBM
   at 1/4 the f32 footprint (512 B/chunk instead of 2 KiB — at the 1M-track
   BASELINE scale, ~47M chunks, that is 24 GB -> 6 GB: the difference
   between fitting on one v5e chip and needing four).  The scoring matmul
   runs int8 x int8 -> int32 on the MXU and is HBM-bandwidth bound, so the
   4x smaller operand is also ~4x faster to stream.
2. **Exact rescore of the oversampled top on host f32 originals.**  The
   top ``limit * oversample`` candidates (a few hundred rows) are rescored
   against the host-side VectorStore matrix — the analog of Qdrant's
   on-disk originals — so returned similarities are EXACT and the 0.60
   vibe threshold (reference: app/settings.py:47) keeps its calibration.

Quantization is symmetric with a quantile-clipped scale, mirroring
Qdrant's ``quantile: 0.99``: the scale is the 0.99-quantile of |value|
over the stored matrix, so a handful of outlier components do not crush
the resolution of everything else.  CLAP embeddings are unit-norm, so
components concentrate near zero and the clipped scale preserves ~2
decimal digits per component — far more than the preselect needs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

QUANTILE = 0.99  # reference: app/audio/qdrant_setup.py:50-77 (quantile=0.99)
DEFAULT_OVERSAMPLE = 4


def quantize_matrix(emb: np.ndarray, quantile: float = QUANTILE) -> tuple[np.ndarray, float]:
    """f32 [N, D] -> (int8 codes [N, D], scale).

    ``codes = round(clip(x, -s, s) / s * 127)`` with ``s`` the
    ``quantile``-quantile of |x| (symmetric, per-matrix — matches the
    collection-level scalar config the reference uses).
    """
    emb = np.asarray(emb, dtype=np.float32)
    if emb.size == 0:
        return np.zeros(emb.shape, np.int8), 1.0
    scale = float(np.quantile(np.abs(emb), quantile))
    scale = max(scale, 1e-8)
    codes = np.clip(np.round(emb / scale * 127.0), -127, 127).astype(np.int8)
    return codes, scale


def quantize_query(q: np.ndarray) -> tuple[np.ndarray, float]:
    """Quantize one query vector with its own max-|x| scale (no clipping:
    a single vector has no outlier population to trim, and full range
    keeps the int8 dot's relative error ~1e-2)."""
    q = np.asarray(q, dtype=np.float32)
    scale = max(float(np.max(np.abs(q))) if q.size else 0.0, 1e-8)
    codes = np.clip(np.round(q / scale * 127.0), -127, 127).astype(np.int8)
    return codes, scale


@dataclass
class QuantVectorIndex:
    """Capacity-padded int8 device mirror of a VectorStore.

    ``host_embeddings`` is the host-side f32 original matrix (row-aligned
    with the device arrays) used for the exact rescore — it never travels
    to the device, playing the role of Qdrant's on-disk originals.
    """

    codes: jax.Array  # int8 [cap, dim]
    track: jax.Array  # int32 [cap] (-1 padding)
    offset_sec: jax.Array  # f32 [cap]
    chunk_index: jax.Array  # int32 [cap]
    n: jax.Array  # int32 scalar
    scale: float = 1.0
    version: int = -1
    host_embeddings: np.ndarray | None = None

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
        codes, scale = quantize_matrix(emb)
        put = functools.partial(jax.device_put, device=device)
        pad_q = np.zeros((cap, vs.dim), np.int8)
        pad_q[:n] = codes
        pad_i = np.full(cap, -1, np.int32)
        pad_i[:n] = trk
        pad_o = np.zeros(cap, np.float32)
        pad_o[:n] = off
        pad_c = np.zeros(cap, np.int32)
        pad_c[:n] = ci
        return cls(
            codes=put(pad_q),
            track=put(pad_i),
            offset_sec=put(pad_o),
            chunk_index=put(pad_c),
            n=put(np.int32(n)),
            scale=scale,
            version=vs.version,
            host_embeddings=np.ascontiguousarray(emb, dtype=np.float32),
        )


jax.tree_util.register_dataclass(
    QuantVectorIndex,
    data_fields=["codes", "track", "offset_sec", "chunk_index", "n"],
    meta_fields=["scale", "version", "host_embeddings"],
)


@functools.partial(jax.jit, static_argnames=("k",))
def _quant_preselect(q_codes: jnp.ndarray, qvi: QuantVectorIndex, k: int):
    """int8 query codes [dim] -> (int32 scores [k], row indices [k]).

    One MXU contraction over the code matrix; padding and tombstoned rows
    are pushed to the bottom with an int32 floor (scores are bounded by
    dim * 127^2 = 8.26e6 << 2^31, so the floor never collides).
    """
    scores = jax.lax.dot_general(
        qvi.codes,
        q_codes,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    idx = jnp.arange(qvi.track.shape[0])
    valid = (idx < qvi.n) & (qvi.track >= 0)
    scores = jnp.where(valid, scores, jnp.int32(-(1 << 30)))
    return jax.lax.top_k(scores, k)


def quant_topk(
    query: np.ndarray,
    qvi: QuantVectorIndex,
    limit: int = 50,
    oversample: int = DEFAULT_OVERSAMPLE,
):
    """Two-phase exact-rescored top-k, same return contract as
    ``vector_topk``: (score[limit] f32, track[limit], offset[limit],
    chunk_index[limit]) with track=-1 past the valid results."""
    q_codes, _ = quantize_query(query)
    k = min(limit * oversample, qvi.track.shape[0])
    top_s, top_i = _quant_preselect(jnp.asarray(q_codes), qvi, k)
    top_s = np.asarray(top_s)
    top_i = np.asarray(top_i)
    ok = top_s > -(1 << 30)
    rows = top_i[ok]

    n_host = 0 if qvi.host_embeddings is None else len(qvi.host_embeddings)
    rows = rows[rows < n_host]
    if len(rows) == 0:
        return (
            np.zeros(limit, np.float32),
            np.full(limit, -1, np.int32),
            np.zeros(limit, np.float32),
            np.zeros(limit, np.int32),
        )

    # exact rescore on the host f32 originals (a few hundred rows)
    q = np.asarray(query, dtype=np.float32)
    exact = qvi.host_embeddings[rows] @ q
    order = np.argsort(-exact, kind="stable")[:limit]
    rows = rows[order]
    scores = exact[order].astype(np.float32)

    track = np.asarray(qvi.track)[rows]
    offset = np.asarray(qvi.offset_sec)[rows]
    chunk = np.asarray(qvi.chunk_index)[rows]
    m = len(rows)
    if m < limit:
        pad = limit - m
        scores = np.concatenate([scores, np.zeros(pad, np.float32)])
        track = np.concatenate([track, np.full(pad, -1, np.int32)])
        offset = np.concatenate([offset, np.zeros(pad, np.float32)])
        chunk = np.concatenate([chunk, np.zeros(pad, np.int32)])
    return scores, track, offset, chunk


# ---------------------------------------------------------------------------
# Mesh-sharded variant: int8 codes row-sharded over ICI
# (quantized twin of parallel/sharded_vectors.py — each device preselects
# over its int8 shard, the tiny candidate lists all_gather, the host
# rescores exactly; at the 1M-track pod scale the 4x HBM saving is what
# lets a v5e-16 hold the chunk matrix with room for the fingerprint CSR)
# ---------------------------------------------------------------------------


@dataclass
class ShardedQuantVectorIndex:
    """[D, rows/D, dim] mesh-sharded int8 mirror of a VectorStore."""

    codes: jax.Array  # int8 [D, per, dim]
    track: jax.Array  # int32 [D, per] (-1 padding)
    offset_sec: jax.Array  # f32 [D, per]
    chunk_index: jax.Array  # int32 [D, per]
    scale: float = 1.0
    version: int = -1
    host_embeddings: np.ndarray | None = None

    @classmethod
    def from_host(cls, vs, mesh, track_valid: np.ndarray | None = None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audio_ident_tpu.parallel.sharded_index import SHARD_AXIS

        vs.flush()
        emb, trk = vs.embeddings, vs.track
        off, ci = vs.offset_sec, vs.chunk_index
        if track_valid is not None and len(trk):
            keep = track_valid[np.clip(trk, 0, len(track_valid) - 1)]
            emb, trk, off, ci = emb[keep], trk[keep], off[keep], ci[keep]
        d = mesh.devices.size
        n = len(trk)
        per = max(128, -(-max(n, 1) // d))
        cap = d * per
        codes, scale = quantize_matrix(emb)
        pq = np.zeros((cap, vs.dim), np.int8)
        pq[:n] = codes
        pt = np.full(cap, -1, np.int32)
        pt[:n] = trk
        po = np.zeros(cap, np.float32)
        po[:n] = off
        pc = np.zeros(cap, np.int32)
        pc[:n] = ci
        shard = NamedSharding(mesh, P(SHARD_AXIS))
        put = functools.partial(jax.device_put, device=shard)
        return cls(
            codes=put(pq.reshape(d, per, vs.dim)),
            track=put(pt.reshape(d, per)),
            offset_sec=put(po.reshape(d, per)),
            chunk_index=put(pc.reshape(d, per)),
            scale=scale,
            version=vs.version,
            host_embeddings=np.ascontiguousarray(emb, dtype=np.float32),
        )


jax.tree_util.register_dataclass(
    ShardedQuantVectorIndex,
    data_fields=["codes", "track", "offset_sec", "chunk_index"],
    meta_fields=["scale", "version", "host_embeddings"],
)


@functools.lru_cache(maxsize=8)
def _sharded_quant_preselect_fn(mesh, k: int):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from audio_ident_tpu.parallel.sharded_index import SHARD_AXIS

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None), (P(SHARD_AXIS), P(SHARD_AXIS))),
        out_specs=(P(None), P(None)),
        check_rep=False,
    )
    def preselect(q_codes, shards):
        codes, trk = (a[0] for a in shards)
        per = trk.shape[0]
        scores = jax.lax.dot_general(
            codes, q_codes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = jnp.where(trk >= 0, scores, jnp.int32(-(1 << 30)))
        kk = min(k, per)
        ls, li = jax.lax.top_k(scores, kk)
        # shard-local row -> global flat row (rows keep store order: the
        # host matrix was reshaped [D, per] without permutation)
        me = jax.lax.axis_index(SHARD_AXIS)
        rows = me * per + li
        gs = jax.lax.all_gather(ls, SHARD_AXIS).reshape(-1)
        gr = jax.lax.all_gather(rows, SHARD_AXIS).reshape(-1)
        ts, ti = jax.lax.top_k(gs, min(k, gs.shape[0]))
        return ts, gr[ti]

    return preselect


def sharded_quant_topk(
    query: np.ndarray,
    sqvi: ShardedQuantVectorIndex,
    mesh,
    limit: int = 50,
    oversample: int = DEFAULT_OVERSAMPLE,
):
    """Sharded two-phase top-k: same return contract as sharded_vector_topk,
    with exact f32 scores after the host rescore."""
    q_codes, _ = quantize_query(query)
    k = limit * oversample
    top_s, top_rows = _sharded_quant_preselect_fn(mesh, k)(
        jnp.asarray(q_codes), (sqvi.codes, sqvi.track)
    )
    top_s = np.asarray(top_s)
    rows = np.asarray(top_rows)[top_s > -(1 << 30)]

    n_host = 0 if sqvi.host_embeddings is None else len(sqvi.host_embeddings)
    rows = rows[rows < n_host]
    if len(rows) == 0:
        return (
            np.zeros(limit, np.float32),
            np.full(limit, -1, np.int32),
            np.zeros(limit, np.float32),
            np.zeros(limit, np.int32),
        )

    q = np.asarray(query, dtype=np.float32)
    exact = sqvi.host_embeddings[rows] @ q
    order = np.argsort(-exact, kind="stable")[:limit]
    rows = rows[order]
    scores = exact[order].astype(np.float32)

    d, per = np.asarray(sqvi.track).shape
    flat_t = np.asarray(sqvi.track).reshape(-1)
    flat_o = np.asarray(sqvi.offset_sec).reshape(-1)
    flat_c = np.asarray(sqvi.chunk_index).reshape(-1)
    track, offset, chunk = flat_t[rows], flat_o[rows], flat_c[rows]
    m = len(rows)
    if m < limit:
        pad = limit - m
        scores = np.concatenate([scores, np.zeros(pad, np.float32)])
        track = np.concatenate([track, np.full(pad, -1, np.int32)])
        offset = np.concatenate([offset, np.zeros(pad, np.float32)])
        chunk = np.concatenate([chunk, np.zeros(pad, np.int32)])
    return scores, track, offset, chunk

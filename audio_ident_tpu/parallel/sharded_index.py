"""Hash-range-sharded fingerprint index over a device mesh.

Scale-out design (SURVEY.md §2 row 35, §5 "distributed communication
backend"): the 24-bit hash space is split into ``D`` contiguous ranges, one
per device along the mesh's ``shard`` axis.  Postings are hash-sorted, so a
shard's CSR is a contiguous slice of the host index — no repartitioning
cost.  A query's hashes are replicated to every device; each device probes
only its range (the HBM-bandwidth-heavy part scales 1/D), then the tiny
sentinel-masked vote arrays are ``all_gather``-ed over ICI and every device
runs the identical histogram/top-k, so the output is replicated AND
bit-identical to the single-chip matcher (parity by construction: the union
of per-shard votes equals the unsharded vote set; sentinels sort last).

Communication cost per query: one all_gather of H*(16+8) int32 triples
(~276 KB for a 10 s clip at D=8) — noise compared to the postings gathers
it distributes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from audio_ident_tpu import spec
from audio_ident_tpu.index.match import (
    HASH_SENTINEL,
    expand_query_jitter,
    probe_votes_arrays,
    votes_to_result,
)

SHARD_AXIS = "shard"


def make_index_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices for index sharding."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (SHARD_AXIS,))


def _pad_rows(rows: list[np.ndarray], fill, min_cap: int = 1) -> np.ndarray:
    cap = max(max((len(r) for r in rows), default=1), 1, min_cap)
    cap = 1 << int(np.ceil(np.log2(cap)))
    out = np.full((len(rows), cap), fill, dtype=rows[0].dtype)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def _delta_row_pad_min(n_shards: int) -> int:
    """Per-shard delta pad floor (see DeviceIndex.delta_pad_min): keeps the
    sharded delta tier's shape constant between compactions so serving on
    the mesh never recompiles under concurrent ingest."""
    from audio_ident_tpu.index.match import DeviceIndex

    return max(1, DeviceIndex.delta_pad_min() // n_shards)


@dataclass
class ShardedDeviceIndex:
    """Mesh-sharded mirror of a FingerprintIndex (leading dim = shard)."""

    offsets: jax.Array  # int32 [D, HASH_SPACE/D + 1]
    tracks: jax.Array  # int32 [D, cap_main]
    times: jax.Array  # int32 [D, cap_main]
    d_hash: jax.Array  # int32 [D, cap_delta] global hash values, sorted
    d_track: jax.Array  # int32 [D, cap_delta]
    d_time: jax.Array  # int32 [D, cap_delta]
    d_count: jax.Array  # int32 [D]
    hash_base: jax.Array  # int32 [D] range starts
    track_valid: jax.Array  # bool [max_tracks] (replicated)
    version: int = -1
    merge_gen: int = -1  # keys the resident main tier (see from_host)

    @classmethod
    def from_host(
        cls, idx, mesh: Mesh, prev: "ShardedDeviceIndex | None" = None
    ) -> "ShardedDeviceIndex":
        """Slice the host index into per-device hash ranges and place it.

        Like the single-chip mirror, the sharded main tier is REUSED when
        ``prev`` carries the same merge generation — between compactions
        only the (small) delta and tombstones cross the host->ICI boundary,
        so serving under concurrent ingest never re-ships the multi-GB
        main run."""
        idx.flush()
        if prev is not None and prev.merge_gen == idx.merge_gen:
            return cls._delta_update(idx, mesh, prev)
        d = mesh.devices.size
        if spec.HASH_SPACE % d:
            raise ValueError(f"mesh size {d} must divide HASH_SPACE")
        span = spec.HASH_SPACE // d
        off = idx.offsets.astype(np.int64)

        offsets_rows, trk_rows, tim_rows = [], [], []
        dh_rows, dt_rows, dti_rows, d_counts, bases = [], [], [], [], []
        for s in range(d):
            lo, hi = s * span, (s + 1) * span
            a, b = int(off[lo]), int(off[hi])
            if b - a > np.iinfo(np.int32).max:
                raise ValueError(
                    f"shard {s} holds {b - a} postings (> int32) — use a "
                    "larger mesh"
                )
            offsets_rows.append((off[lo : hi + 1] - off[lo]).astype(np.int32))
            trk_rows.append(idx.tracks[a:b])
            tim_rows.append(idx.times[a:b])
            da = int(np.searchsorted(idx.d_hash, lo, side="left"))
            db = int(np.searchsorted(idx.d_hash, hi, side="left"))
            dh_rows.append(idx.d_hash[da:db])
            dt_rows.append(idx.d_track[da:db])
            dti_rows.append(idx.d_time[da:db])
            d_counts.append(db - da)
            bases.append(lo)

        shard = NamedSharding(mesh, P(SHARD_AXIS))
        repl = NamedSharding(mesh, P())
        put_s = functools.partial(jax.device_put, device=shard)
        return cls(
            offsets=put_s(np.stack(offsets_rows)),
            tracks=put_s(_pad_rows(trk_rows, 0)),
            times=put_s(_pad_rows(tim_rows, 0)),
            d_hash=put_s(_pad_rows(dh_rows, HASH_SENTINEL, _delta_row_pad_min(d))),
            d_track=put_s(_pad_rows(dt_rows, 0, _delta_row_pad_min(d))),
            d_time=put_s(_pad_rows(dti_rows, 0, _delta_row_pad_min(d))),
            d_count=put_s(np.asarray(d_counts, np.int32)),
            hash_base=put_s(np.asarray(bases, np.int32)),
            track_valid=jax.device_put(idx.track_valid, repl),
            version=idx.version,
            merge_gen=idx.merge_gen,
        )

    @classmethod
    def _delta_update(cls, idx, mesh: Mesh, prev: "ShardedDeviceIndex"):
        """Re-place only the delta rows + tombstones; main tier is reused."""
        d = mesh.devices.size
        span = spec.HASH_SPACE // d
        dh_rows, dt_rows, dti_rows, d_counts = [], [], [], []
        for s in range(d):
            lo, hi = s * span, (s + 1) * span
            da = int(np.searchsorted(idx.d_hash, lo, side="left"))
            db = int(np.searchsorted(idx.d_hash, hi, side="left"))
            dh_rows.append(idx.d_hash[da:db])
            dt_rows.append(idx.d_track[da:db])
            dti_rows.append(idx.d_time[da:db])
            d_counts.append(db - da)
        shard = NamedSharding(mesh, P(SHARD_AXIS))
        repl = NamedSharding(mesh, P())
        put_s = functools.partial(jax.device_put, device=shard)
        return cls(
            offsets=prev.offsets,
            tracks=prev.tracks,
            times=prev.times,
            d_hash=put_s(_pad_rows(dh_rows, HASH_SENTINEL, _delta_row_pad_min(d))),
            d_track=put_s(_pad_rows(dt_rows, 0, _delta_row_pad_min(d))),
            d_time=put_s(_pad_rows(dti_rows, 0, _delta_row_pad_min(d))),
            d_count=put_s(np.asarray(d_counts, np.int32)),
            hash_base=prev.hash_base,
            track_valid=jax.device_put(idx.track_valid, repl),
            version=idx.version,
            merge_gen=idx.merge_gen,
        )


jax.tree_util.register_dataclass(
    ShardedDeviceIndex,
    data_fields=[
        "offsets", "tracks", "times",
        "d_hash", "d_track", "d_time", "d_count", "hash_base", "track_valid",
    ],
    meta_fields=["version", "merge_gen"],
)


@functools.lru_cache(maxsize=16)
def _sharded_match_fn(mesh: Mesh, jitter: bool = True):
    """Compile-cached BATCHED sharded matcher for a mesh.

    Queries carry a leading window/batch dim [B, H]: every per-shard probe
    is vmapped and the vote triples are all_gather-ed once, so a whole
    request (e.g. the 3 consensus sub-windows) — or several micro-batched
    requests — costs ONE device dispatch instead of B (round-1 looped
    per window: ~26 ms tunnel dispatch each, flagged in VERDICT.md)."""

    sharded = tuple(P(SHARD_AXIS) for _ in range(8))  # 8 shard-split arrays

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None), P(None), P(None), sharded, P(None)),
        out_specs=(P(None), P(None), P(None)),
        check_rep=False,
    )
    def matcher(q_hash, q_time, q_valid, shards, track_valid):
        offsets, tracks, times, d_hash, d_track, d_time, d_count, hash_base = shards

        def probe_one(qh, qt, qv):
            if jitter:
                qh, qt, qv = expand_query_jitter(qh, qt, qv)
            return probe_votes_arrays(
                qh, qt, qv,
                offsets[0], tracks[0], times[0],
                d_hash[0], d_track[0], d_time[0],
                d_count[0], track_valid,
                hash_base=hash_base[0],
            )

        vt, vb, vd = jax.vmap(probe_one)(q_hash, q_time, q_valid)  # [B, V]
        # gather every shard's votes: [D, B, V] -> per-window [B, D*V]
        bsz = vt.shape[0]
        vt = jax.lax.all_gather(vt, SHARD_AXIS).transpose(1, 0, 2).reshape(bsz, -1)
        vb = jax.lax.all_gather(vb, SHARD_AXIS).transpose(1, 0, 2).reshape(bsz, -1)
        vd = jax.lax.all_gather(vd, SHARD_AXIS).transpose(1, 0, 2).reshape(bsz, -1)
        return jax.vmap(votes_to_result)(vt, vb, vd)

    return matcher


def sharded_match_batch(
    q_hash, q_time, q_valid, sdi: ShardedDeviceIndex, mesh: Mesh,
    jitter: bool = True,
):
    """Batched [B, H] queries -> replicated (track[B, NC], aligned, offset)."""
    shards = (
        sdi.offsets, sdi.tracks, sdi.times,
        sdi.d_hash, sdi.d_track, sdi.d_time, sdi.d_count, sdi.hash_base,
    )
    return _sharded_match_fn(mesh, jitter)(
        jnp.asarray(q_hash, jnp.int32), jnp.asarray(q_time, jnp.int32),
        jnp.asarray(q_valid), shards, sdi.track_valid,
    )


def sharded_match(q_hash, q_time, q_valid, sdi: ShardedDeviceIndex, mesh: Mesh):
    """Replicated (track[NC], aligned[NC], offset_sec[NC]) over the mesh."""
    trk, ali, off = sharded_match_batch(
        jnp.asarray(q_hash, jnp.int32)[None],
        jnp.asarray(q_time, jnp.int32)[None],
        jnp.asarray(q_valid)[None],
        sdi, mesh,
    )
    return trk[0], ali[0], off[0]

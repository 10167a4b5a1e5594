"""Device matcher: batched hash-bucket probe + offset-histogram voting.

Mirrors ``cpu_reference.match.match_votes_np`` exactly (frozen semantics) in
a TPU-friendly, scatter-free formulation:

- probes are pure gathers (CSR bucket fan-out + delta binary search);
- vote histogramming is sort-based run counting: votes are lexicographically
  sorted by (track, bin), run lengths come from cummax/cummin scans, and the
  adjacent-bin window score reads the next run via gathers;
- top-candidate selection is a single top_k + an O(nw^2) dedup mask.

Everything is int32/f32 (no x64 requirement); all shapes static per
(query-bucket, index-capacity) pair, so XLA compiles one program per bucket
and caches it.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audio_ident_tpu import spec

TRACK_SENTINEL = np.int32(1 << 30)
HASH_SENTINEL = np.int32(0x7FFFFFFF)


@dataclass
class DeviceIndex:
    """Immutable device mirror of a FingerprintIndex (capacity-padded)."""

    offsets: jax.Array  # int32 [HASH_SPACE + 1]
    tracks: jax.Array  # int32 [cap_main]
    times: jax.Array  # int32 [cap_main]
    n_main: jax.Array  # int32 scalar (logical postings)
    d_hash: jax.Array  # int32 [cap_delta] (sorted; HASH_SENTINEL padding)
    d_track: jax.Array  # int32 [cap_delta]
    d_time: jax.Array  # int32 [cap_delta]
    d_count: jax.Array  # int32 scalar
    track_valid: jax.Array  # bool [max_tracks]
    version: int = -1
    merge_gen: int = -1  # keys the resident main tier (see from_host)

    @staticmethod
    def delta_pad_min() -> int:
        """Pad floor for the delta tier's device arrays.

        On a real accelerator the floor is 2^20 postings so the delta
        tier's padded SHAPE is constant between compactions: the query
        program is keyed on array shapes, and each pow2 growth of the
        delta under concurrent ingest was a multi-minute cold XLA compile
        serialized onto the serving path (observed on the 100k
        mixed-workload bench through the remote compiler).  2^20 x 12 B
        = 12 MB — noise in HBM and ~70 ms per re-upload.  CPU (the test
        suite) keeps the small floor: XLA:CPU sort/searchsorted codegen
        is ~8 s per op and tests build hundreds of tiny mirrors.
        """
        return (1 << 20) if jax.default_backend() != "cpu" else 1024

    @staticmethod
    def _pad_pow2(a: np.ndarray, fill, min_cap: int = 1024) -> np.ndarray:
        n = max(len(a), 1)
        if n > (1 << 27):
            # beyond 134M postings, pow2 padding wastes GBs of HBM; pad to
            # the next 64M-entry step instead (recompiles stay rare)
            step = 1 << 26
            cap = ((n + step - 1) // step) * step
        else:
            cap = max(min_cap, 1 << int(np.ceil(np.log2(n))))
        out = np.full(cap, fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    @classmethod
    def from_host(cls, idx, device=None, prev: "DeviceIndex | None" = None) -> "DeviceIndex":
        """Build from a FingerprintIndex (flushes pending first).

        ``prev``: the previous mirror, if any.  The main CSR changes ONLY
        at LSM compaction (merge_gen), so when the generation matches, the
        resident device arrays for the main tier are REUSED and only the
        delta + tombstones re-upload.  Without this, every ingest-then-
        query cycle re-shipped the whole main run host->device — 3.4 GB
        per bump at 100k tracks, which serialized minutes of transfer on
        the serving path under concurrent ingest (the BASELINE pod row's
        "concurrent bulk ingest + query" workload).  The same incremental
        split the on-disk snapshots use (store.write_snapshot).
        """
        idx.flush()
        if len(idx.tracks) > np.iinfo(np.int32).max:
            raise ValueError(
                "single-device mirror exceeds int32 postings — shard the "
                "index over a mesh (MESH_SHARDS) instead"
            )
        put = functools.partial(jax.device_put, device=device)
        dmin = cls.delta_pad_min()
        if prev is not None and prev.merge_gen == idx.merge_gen:
            offsets, tracks, times, n_main = (
                prev.offsets, prev.tracks, prev.times, prev.n_main
            )
        else:
            offsets = put(idx.offsets.astype(np.int32))
            tracks = put(cls._pad_pow2(idx.tracks, 0))
            times = put(cls._pad_pow2(idx.times, 0))
            n_main = put(np.int32(len(idx.tracks)))
        return cls(
            offsets=offsets,
            tracks=tracks,
            times=times,
            n_main=n_main,
            d_hash=put(cls._pad_pow2(idx.d_hash, HASH_SENTINEL, dmin)),
            d_track=put(cls._pad_pow2(idx.d_track, 0, dmin)),
            d_time=put(cls._pad_pow2(idx.d_time, 0, dmin)),
            d_count=put(np.int32(len(idx.d_hash))),
            track_valid=put(idx.track_valid),
            version=idx.version,
            merge_gen=idx.merge_gen,
        )


def expand_query_jitter(q_hash, q_time, q_valid):
    """[H] query hashes -> [V*H] single-step jitter variants.

    Mirrors ``cpu_reference.match.expand_query_jitter_np`` exactly.  For
    each packed hash the anchor bin, target bin, and frame delta are
    unpacked, shifted per spec.QUERY_JITTER_VARIANTS, revalidated against
    the packing bounds, and repacked; invalid variants keep the original
    hash with valid=False (shapes stay static).  A true db posting is hit
    by exactly ONE variant of a given query hash, so true aligned counts
    do not inflate — only recall of ±1-drifted peaks improves.
    """
    h = q_hash.astype(jnp.int32)
    f = h >> spec.F_ANCHOR_SHIFT
    dfb = (h >> spec.DF_SHIFT) & ((1 << (spec.F_ANCHOR_SHIFT - spec.DF_SHIFT)) - 1)
    dt = h & ((1 << spec.DF_SHIFT) - 1)
    df = dfb - spec.DF_BIAS
    f_t = f + df  # target bin

    outs_h, outs_t, outs_v = [], [], []
    for da, dtf, ddt in spec.QUERY_JITTER_VARIANTS:
        f2 = f + da
        df2 = df - da + dtf
        dt2 = dt + ddt
        ft2 = f_t + dtf
        ok = (
            q_valid
            & (f2 >= spec.MIN_FREQ_BIN) & (f2 <= spec.MAX_FREQ_BIN)
            & (ft2 >= spec.MIN_FREQ_BIN) & (ft2 <= spec.MAX_FREQ_BIN)
            & (jnp.abs(df2) <= spec.MAX_DF)
            & (dt2 >= spec.MIN_DT) & (dt2 <= spec.MAX_DT)
        )
        h2 = (
            (f2 << spec.F_ANCHOR_SHIFT)
            | ((df2 + spec.DF_BIAS) << spec.DF_SHIFT)
            | dt2
        )
        outs_h.append(jnp.where(ok, h2, h))
        outs_t.append(q_time)
        outs_v.append(ok)
    return (
        jnp.concatenate(outs_h),
        jnp.concatenate(outs_t),
        jnp.concatenate(outs_v),
    )


def probe_votes_arrays(
    q_hash,
    q_time,
    q_valid,
    offsets,
    tracks,
    times,
    d_hash,
    d_track,
    d_time,
    d_count,
    track_valid,
    hash_base=0,
):
    """Gather candidate votes -> (v_track, v_bin, v_dt) with sentinel-masked
    invalid entries; static size H * (PROBE_FANOUT_MAIN + PROBE_FANOUT_DELTA).

    ``hash_base`` supports hash-range sharding: ``offsets`` covers buckets
    [hash_base, hash_base + len(offsets) - 1); out-of-range query hashes are
    masked.  The delta arrays keep GLOBAL hash values (a shard's slice of the
    sorted delta), so the binary search needs no rebasing.
    """
    h = q_hash.astype(jnp.int32)
    qt = q_time.astype(jnp.int32)
    max_tracks = track_valid.shape[0]
    n_buckets = offsets.shape[0] - 1
    h_local = h - hash_base
    in_range = (h_local >= 0) & (h_local < n_buckets)
    h_local = jnp.clip(h_local, 0, n_buckets - 1)

    def make_votes(rtrk, rt, ok):
        dt = rt - qt[:, None]
        b = jnp.floor_divide(dt, spec.OFFSET_BIN_FRAMES) + spec.OFFSET_BIN_NEG
        ok = (
            ok
            & (b >= 0)
            & (b < spec.MAX_OFFSET_BINS)
            & track_valid[jnp.clip(rtrk, 0, max_tracks - 1)]
        )
        vt = jnp.where(ok, rtrk, TRACK_SENTINEL)
        return vt, jnp.where(ok, b, 0), jnp.where(ok, dt, 0)

    def strided_idx(chain_len, fanout):
        """Chain-relative probe positions: 0..fanout-1 for short chains;
        for long chains, floor(k*len/fanout) rotated by (hash mod len) —
        evenly spread AND de-correlated across buckets (without the
        rotation, buckets with identical composition sample the SAME
        track subset every time).  Unbiased at any scale — see spec.py
        PROBE_FANOUT notes."""
        k = jnp.arange(fanout, dtype=jnp.int32)[None, :]
        ln = chain_len[:, None]
        ln_safe = jnp.maximum(ln, 1)
        rot = (k * ln) // fanout + (h[:, None] % ln_safe)
        rot = jnp.where(rot >= ln, rot - ln, rot)
        return jnp.where(ln <= fanout, k, rot)

    # main CSR probe (strided)
    start = offsets[h_local]
    end = offsets[h_local + 1]
    idx_m = strided_idx(end - start, spec.PROBE_FANOUT_MAIN)
    pos = start[:, None] + idx_m
    ok_m = (q_valid & in_range)[:, None] & (idx_m < (end - start)[:, None])
    pos_c = jnp.clip(pos, 0, tracks.shape[0] - 1)
    vt_m, vb_m, vd_m = make_votes(tracks[pos_c], times[pos_c], ok_m)

    # delta probe (binary search into sorted delta hashes, strided)
    start_d = jnp.searchsorted(d_hash, h, side="left").astype(jnp.int32)
    end_d = jnp.searchsorted(d_hash, h, side="right").astype(jnp.int32)
    idx_d = strided_idx(end_d - start_d, spec.PROBE_FANOUT_DELTA)
    pos_d = start_d[:, None] + idx_d
    inb = (idx_d < (end_d - start_d)[:, None]) & (pos_d < d_count)
    pos_dc = jnp.clip(pos_d, 0, d_hash.shape[0] - 1)
    ok_d = q_valid[:, None] & inb
    vt_d, vb_d, vd_d = make_votes(d_track[pos_dc], d_time[pos_dc], ok_d)

    v_track = jnp.concatenate([vt_m.reshape(-1), vt_d.reshape(-1)])
    v_bin = jnp.concatenate([vb_m.reshape(-1), vb_d.reshape(-1)])
    v_dt = jnp.concatenate([vd_m.reshape(-1), vd_d.reshape(-1)])
    return v_track, v_bin, v_dt


def _probe_votes(q_hash, q_time, q_valid, di: DeviceIndex):
    return probe_votes_arrays(
        q_hash, q_time, q_valid,
        di.offsets, di.tracks, di.times,
        di.d_hash, di.d_track, di.d_time, di.d_count, di.track_valid,
    )


def match_device_fn(q_hash, q_time, q_valid, di: DeviceIndex, jitter: bool = True):
    """(track[NC], aligned[NC], offset_sec[NC]) — see frozen semantics.

    ``jitter`` (trace-time constant) gates the ±1-step probe expansion:
    the cheap first pass of two-pass querying (spec.py two-pass notes)
    probes exact hashes only — 1/7th the probe volume — and escalates to
    the jitter-expanded pass only when the verdict gate is unsatisfied.
    """
    if jitter:
        q_hash, q_time, q_valid = expand_query_jitter(q_hash, q_time, q_valid)
    v_track, v_bin, v_dt = _probe_votes(q_hash, q_time, q_valid, di)
    return votes_to_result(v_track, v_bin, v_dt)


def votes_to_result(v_track, v_bin, v_dt):
    """Sentinel-masked votes -> (track[NC], aligned[NC], offset_sec[NC]).

    Shared by the single-chip matcher and the sharded path (which
    all_gathers per-shard votes and runs this replicated).
    """
    nc = spec.CANDIDATE_TRACKS
    nw = 2 * nc
    v = v_track.shape[0]

    # sort votes by (track, bin); invalid (TRACK_SENTINEL) go last
    trk, bn, dt = jax.lax.sort((v_track, v_bin, v_dt), num_keys=2)
    valid_v = trk != TRACK_SENTINEL

    idx = jnp.arange(v, dtype=jnp.int32)
    prev_trk = jnp.concatenate([jnp.full(1, -1, jnp.int32), trk[:-1]])
    prev_bin = jnp.concatenate([jnp.full(1, -1, jnp.int32), bn[:-1]])
    st = (trk != prev_trk) | (bn != prev_bin)

    start_pos = jax.lax.cummax(jnp.where(st, idx, -1))
    nxt_src = jnp.concatenate([jnp.where(st, idx, v)[1:], jnp.full(1, v, jnp.int32)])
    nxt = jax.lax.cummin(nxt_src, reverse=True)
    run_len = nxt - start_pos  # defined at every position of the run

    # int32 prefix sums: wraparound-exact run sums (f32 cumsum would lose
    # whole frames of offset precision at this length)
    pre = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(dt)])
    run_dt = pre[nxt] - pre[start_pos]

    nxt_c = jnp.clip(nxt, 0, v - 1)
    cont = (nxt < v) & (trk[nxt_c] == trk) & (bn[nxt_c] == bn + 1)
    len2 = jnp.where(cont, run_len[nxt_c], 0)
    dt2 = jnp.where(cont, run_dt[nxt_c], 0)

    win = jnp.where(st & valid_v, run_len + len2, 0)
    dt_tot = run_dt + dt2

    # top 2*NC windows by (score desc, (track,bin) asc — tie by index)
    top_win, top_idx = jax.lax.top_k(win, nw)
    top_trk = trk[top_idx]
    top_off = (
        dt_tot[top_idx].astype(jnp.float32)
        / jnp.maximum(top_win, 1).astype(jnp.float32)
        / jnp.float32(spec.FRAMES_PER_SEC)
    )

    # dedup per track, keep first occurrence (= best window), first NC rows
    eq = top_trk[:, None] == top_trk[None, :]
    dup = jnp.tril(eq, -1).any(axis=1)
    keep = (~dup) & (top_win > 0)
    top_win = jnp.where(keep, top_win, 0)  # dropped dups must not pass `good`
    slot_key = jnp.where(keep, jnp.arange(nw, dtype=jnp.int32), jnp.int32(1 << 30))
    _, o_trk, o_win, o_off = jax.lax.sort(
        (slot_key, top_trk, top_win, top_off), num_keys=1
    )
    o_trk, o_win, o_off = o_trk[:nc], o_win[:nc], o_off[:nc]
    good = o_win > 0
    return (
        jnp.where(good, o_trk, -1),
        jnp.where(good, o_win, 0),
        jnp.where(good, o_off, 0.0),
    )


@functools.partial(jax.jit, static_argnames=("jitter",))
def match_device(q_hash, q_time, q_valid, di: DeviceIndex, jitter: bool = True):
    return match_device_fn(q_hash, q_time, q_valid, di, jitter=jitter)


jax.tree_util.register_dataclass(
    DeviceIndex,
    data_fields=[
        "offsets", "tracks", "times", "n_main",
        "d_hash", "d_track", "d_time", "d_count", "track_valid",
    ],
    meta_fields=["version", "merge_gen"],
)

"""NumPy golden match engine (frozen semantics, format v1).

Implements the query side of the inverted fingerprint index: hash-bucket
probe + per-track time-offset histogram voting.  Replaces the role of
``olaf_c query`` against LMDB (reference:
audio-ident-service/app/audio/fingerprint.py:158-219) and produces the same
information content as the reference's ``OlafMatch`` rows (match_count /
reference offset), reference: app/audio/fingerprint.py:30-50.

Index layout (shared with the device path, see audio_ident_tpu.index.store):
- main CSR: ``offsets`` int32 [HASH_SPACE+1]; postings ``tracks``/``times``
  int32 [N], lexsorted by (hash, track, time).
- delta: ``d_hash`` int32 [C] (lexsorted the same way), ``d_track``,
  ``d_time`` int32 [C], logical length ``d_count``.  New ingests land in the
  delta; a background merge folds it into the CSR (LSM-style, the
  functional-JAX answer to LMDB's mutable B-tree).
- ``track_valid``: bool [max_tracks] tombstone bitmap (delete support).

Frozen decision rules (mirrored exactly by the device matcher — the device
formulation is sort-based run counting, chosen so the TPU path needs no
scatters; this NumPy path computes the same function):
1. per query hash, examine PROBE_FANOUT_MAIN postings of its main bucket
   and PROBE_FANOUT_DELTA delta postings, STRIDED across the chain:
   position k probes chain index k when the chain fits the fanout, else
   floor(k * chain_len / fanout) — unbiased sampling at any library scale
   (spec.py PROBE_FANOUT notes).
2. a vote is (track, bin) with bin = floor((t_ref - t_query) /
   OFFSET_BIN_FRAMES) + OFFSET_BIN_NEG, valid iff 0 <= bin < MAX_OFFSET_BINS
   and the track's tombstone bit is set.
3. window score of (track, b) = votes(track, b) + votes(track, b+1)
   (adjacent-bin tolerance).  Take the top 2*CANDIDATE_TRACKS windows by
   (score desc, (track, b) asc), deduplicate per track keeping the first
   (= best) window, keep the first CANDIDATE_TRACKS tracks.
4. aligned_hashes = window score; offset = mean dt (frames) of the votes in
   the winning bin pair, reported in seconds.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from audio_ident_tpu import spec


@dataclass
class MatchResult:
    """Top candidate tracks, strongest first (aligned desc, key asc)."""

    track: np.ndarray  # int32 [CANDIDATE_TRACKS] internal track rows (-1 pad)
    aligned: np.ndarray  # int32 [CANDIDATE_TRACKS] aligned hash counts
    offset_sec: np.ndarray  # float32 [CANDIDATE_TRACKS]


def expand_query_jitter_np(
    q_hash: np.ndarray, q_time: np.ndarray, q_valid: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NumPy mirror of ``index.match.expand_query_jitter`` (frozen
    query-side semantics: every query hash also probes its single-step
    anchor-bin / target-bin / frame-delta jitters)."""
    h = q_hash.astype(np.int64)
    f = h >> spec.F_ANCHOR_SHIFT
    dfb = (h >> spec.DF_SHIFT) & ((1 << (spec.F_ANCHOR_SHIFT - spec.DF_SHIFT)) - 1)
    dt = h & ((1 << spec.DF_SHIFT) - 1)
    df = dfb - spec.DF_BIAS
    f_t = f + df

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
            & (np.abs(df2) <= spec.MAX_DF)
            & (dt2 >= spec.MIN_DT) & (dt2 <= spec.MAX_DT)
        )
        h2 = (
            (f2 << spec.F_ANCHOR_SHIFT)
            | ((df2 + spec.DF_BIAS) << spec.DF_SHIFT)
            | dt2
        )
        outs_h.append(np.where(ok, h2, h))
        outs_t.append(np.asarray(q_time))
        outs_v.append(ok)
    return (
        np.concatenate(outs_h),
        np.concatenate(outs_t),
        np.concatenate(outs_v),
    )


def probe_votes_np(
    q_hash: np.ndarray,
    q_time: np.ndarray,
    q_valid: np.ndarray,
    offsets: np.ndarray,
    tracks: np.ndarray,
    times: np.ndarray,
    d_hash: np.ndarray,
    d_track: np.ndarray,
    d_time: np.ndarray,
    d_count: int,
    track_valid: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather candidate votes -> (v_track, v_bin, v_dt) int64, valid only."""
    h = q_hash.astype(np.int64)
    n_post = len(tracks)
    qt = q_time.astype(np.int64)
    max_tracks = len(track_valid)

    vt_list, vbin_list, vdt_list = [], [], []

    def emit(rtrk, rt, ok):
        dt = rt - qt
        b = dt // spec.OFFSET_BIN_FRAMES + spec.OFFSET_BIN_NEG
        ok = (
            ok
            & (b >= 0)
            & (b < spec.MAX_OFFSET_BINS)
            & track_valid[np.clip(rtrk, 0, max_tracks - 1)]
        )
        vt_list.append(rtrk[ok])
        vbin_list.append(b[ok])
        vdt_list.append(dt[ok])

    def strided_idx(chain_len, k, fanout):
        ln_safe = np.maximum(chain_len, 1)
        rot = (k * chain_len) // fanout + (h % ln_safe)
        rot = np.where(rot >= chain_len, rot - chain_len, rot)
        return np.where(chain_len <= fanout, k, rot)

    if n_post > 0:
        start = offsets[h].astype(np.int64)
        end = offsets[h + 1].astype(np.int64)
        ln = end - start
        for k in range(spec.PROBE_FANOUT_MAIN):
            idx = strided_idx(ln, k, spec.PROBE_FANOUT_MAIN)
            pos = start + idx
            ok = q_valid & (idx < ln)
            pos_c = np.clip(pos, 0, n_post - 1)
            emit(tracks[pos_c].astype(np.int64), times[pos_c].astype(np.int64), ok)

    if d_count > 0:
        dh = d_hash[:d_count].astype(np.int64)
        start_d = np.searchsorted(dh, h, side="left")
        end_d = np.searchsorted(dh, h, side="right")
        ln_d = end_d - start_d
        for k in range(spec.PROBE_FANOUT_DELTA):
            idx = strided_idx(ln_d, k, spec.PROBE_FANOUT_DELTA)
            pos = start_d + idx
            inb = (idx < ln_d) & (pos < d_count)
            pos_c = np.clip(pos, 0, d_count - 1)
            ok = q_valid & inb
            emit(d_track[pos_c].astype(np.int64), d_time[pos_c].astype(np.int64), ok)

    if not vt_list:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return (
        np.concatenate(vt_list),
        np.concatenate(vbin_list),
        np.concatenate(vdt_list),
    )


def match_votes_np(
    q_hash: np.ndarray,
    q_time: np.ndarray,
    q_valid: np.ndarray,
    offsets: np.ndarray,
    tracks: np.ndarray,
    times: np.ndarray,
    d_hash: np.ndarray,
    d_track: np.ndarray,
    d_time: np.ndarray,
    d_count: int,
    track_valid: np.ndarray,
) -> MatchResult:
    """Window-vote matcher (see module docstring for frozen semantics)."""
    nc = spec.CANDIDATE_TRACKS
    nw = 2 * nc

    q_hash, q_time, q_valid = expand_query_jitter_np(q_hash, q_time, q_valid)
    v_track, v_bin, v_dt = probe_votes_np(
        q_hash, q_time, q_valid, offsets, tracks, times,
        d_hash, d_track, d_time, d_count, track_valid,
    )

    empty = MatchResult(
        track=np.full(nc, -1, dtype=np.int32),
        aligned=np.zeros(nc, dtype=np.int32),
        offset_sec=np.zeros(nc, dtype=np.float32),
    )
    if len(v_track) == 0:
        return empty

    keys = v_track * spec.MAX_OFFSET_BINS + v_bin
    uniq, counts = np.unique(keys, return_counts=True)
    pos = np.searchsorted(uniq, keys)
    dt_sum = np.bincount(pos, weights=v_dt.astype(np.float64), minlength=len(uniq))

    nxt = np.searchsorted(uniq, uniq + 1)
    nxt_c = np.clip(nxt, 0, len(uniq) - 1)
    has_next = (nxt < len(uniq)) & (uniq[nxt_c] == uniq + 1) & (
        (uniq + 1) // spec.MAX_OFFSET_BINS == uniq // spec.MAX_OFFSET_BINS
    )
    win = counts + np.where(has_next, counts[nxt_c], 0)
    dt_win = dt_sum + np.where(has_next, dt_sum[nxt_c], 0.0)

    # top 2*NC windows by (score desc, key asc)
    order = np.lexsort((uniq, -win))[:nw]
    trk_o = (uniq[order] // spec.MAX_OFFSET_BINS).astype(np.int64)
    win_o = win[order].astype(np.int64)
    off_o = (dt_win[order] / np.maximum(win_o, 1) / spec.FRAMES_PER_SEC).astype(
        np.float32
    )

    # dedup per track keeping the first (= best) window, first NC tracks
    out_t = np.full(nc, -1, dtype=np.int32)
    out_a = np.zeros(nc, dtype=np.int32)
    out_o = np.zeros(nc, dtype=np.float32)
    seen: set[int] = set()
    j = 0
    for i in range(len(trk_o)):
        if win_o[i] <= 0 or int(trk_o[i]) in seen:
            continue
        seen.add(int(trk_o[i]))
        out_t[j] = trk_o[i]
        out_a[j] = win_o[i]
        out_o[j] = off_o[i]
        j += 1
        if j >= nc:
            break
    return MatchResult(track=out_t, aligned=out_a, offset_sec=out_o)

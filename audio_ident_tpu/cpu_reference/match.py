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
- delta: ``d_hash`` uint32 [C] (lexsorted the same way), ``d_track``,
  ``d_time`` int32 [C], logical length ``d_count``.
- ``track_valid``: bool [max_tracks] tombstone bitmap (delete support).

Frozen decision rules:
1. per query hash, examine the first PROBE_FANOUT_MAIN postings of its main
   bucket and the first PROBE_FANOUT_DELTA delta postings.
2. a vote is (track, bin) with bin = floor((t_ref - t_query) /
   OFFSET_BIN_FRAMES) + OFFSET_BIN_NEG, valid iff 0 <= bin < MAX_OFFSET_BINS
   and the track's tombstone bit is set.
3. pass 1 preselects CANDIDATE_TRACKS tracks by raw vote count (ties: lowest
   track id).  pass 2 histograms votes per candidate over offset bins;
   aligned_hashes = max over b of hist[b] + hist[b+1] (ties: lowest b);
   offset = mean dt (frames) of the votes inside the winning bin pair.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from audio_ident_tpu import spec


@dataclass
class MatchResult:
    """Top candidate tracks, strongest first (aligned desc, track asc)."""

    track: np.ndarray  # int32 [CANDIDATE_TRACKS] internal track row ids
    aligned: np.ndarray  # int32 [CANDIDATE_TRACKS] aligned hash counts
    offset_sec: np.ndarray  # float32 [CANDIDATE_TRACKS]


def _probe_votes_np(
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
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Gather all candidate votes -> (v_track, v_bin, v_dt, v_valid)."""
    h = q_hash.astype(np.int64)
    n_post = len(tracks)

    vt_list, vbin_list, vdt_list, vv_list = [], [], [], []

    # main CSR probe
    start = offsets[h].astype(np.int64)
    end = offsets[h + 1].astype(np.int64)
    for k in range(spec.PROBE_FANOUT_MAIN):
        pos = start + k
        ok = q_valid & (pos < end)
        pos_c = np.clip(pos, 0, max(n_post - 1, 0))
        if n_post == 0:
            ok = np.zeros_like(ok)
            pos_c = np.zeros_like(pos_c)
            rt = np.zeros_like(pos_c, dtype=np.int64)
            rtrk = np.zeros_like(pos_c, dtype=np.int64)
        else:
            rt = times[pos_c].astype(np.int64)
            rtrk = tracks[pos_c].astype(np.int64)
        dt = rt - q_time.astype(np.int64)
        b = dt // spec.OFFSET_BIN_FRAMES + spec.OFFSET_BIN_NEG
        ok = ok & (b >= 0) & (b < spec.MAX_OFFSET_BINS) & track_valid[np.clip(rtrk, 0, len(track_valid) - 1)]
        vt_list.append(rtrk)
        vbin_list.append(b)
        vdt_list.append(dt)
        vv_list.append(ok)

    # delta probe
    if d_count > 0:
        dh = d_hash[:d_count]
        start_d = np.searchsorted(dh, q_hash, side="left").astype(np.int64)
        for k in range(spec.PROBE_FANOUT_DELTA):
            pos = start_d + k
            inb = pos < d_count
            pos_c = np.clip(pos, 0, d_count - 1)
            ok = q_valid & inb & (dh[pos_c] == q_hash)
            rt = d_time[pos_c].astype(np.int64)
            rtrk = d_track[pos_c].astype(np.int64)
            dt = rt - q_time.astype(np.int64)
            b = dt // spec.OFFSET_BIN_FRAMES + spec.OFFSET_BIN_NEG
            ok = ok & (b >= 0) & (b < spec.MAX_OFFSET_BINS) & track_valid[np.clip(rtrk, 0, len(track_valid) - 1)]
            vt_list.append(rtrk)
            vbin_list.append(b)
            vdt_list.append(dt)
            vv_list.append(ok)

    v_track = np.concatenate(vt_list) if vt_list else np.zeros(0, dtype=np.int64)
    v_bin = np.concatenate(vbin_list) if vbin_list else np.zeros(0, dtype=np.int64)
    v_dt = np.concatenate(vdt_list) if vdt_list else np.zeros(0, dtype=np.int64)
    v_valid = np.concatenate(vv_list) if vv_list else np.zeros(0, dtype=bool)
    return v_track, v_bin, v_dt, v_valid


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
    """Two-pass probe + vote (see module docstring for frozen semantics)."""
    max_tracks = len(track_valid)
    v_track, v_bin, v_dt, v_valid = _probe_votes_np(
        q_hash, q_time, q_valid, offsets, tracks, times,
        d_hash, d_track, d_time, d_count, track_valid,
    )

    nc = spec.CANDIDATE_TRACKS

    # pass 1: raw vote count per track, preselect top candidates
    counts = np.bincount(
        v_track[v_valid].astype(np.int64), minlength=max_tracks
    ).astype(np.int64)
    order = np.argsort(-counts, kind="stable")[:nc]  # ties -> lowest track id
    cand = np.sort(order.astype(np.int64))  # ascending for searchsorted

    # pass 2: per-candidate offset histogram
    slot = np.searchsorted(cand, v_track)
    slot_c = np.clip(slot, 0, nc - 1)
    hit = v_valid & (cand[slot_c] == v_track)
    key = slot_c * spec.MAX_OFFSET_BINS + v_bin
    nbins = nc * spec.MAX_OFFSET_BINS
    hist = np.bincount(key[hit], minlength=nbins).astype(np.int32)
    dt_sum = np.bincount(
        key[hit], weights=v_dt[hit].astype(np.float64), minlength=nbins
    ).astype(np.float32)
    hist = hist.reshape(nc, spec.MAX_OFFSET_BINS)
    dt_sum = dt_sum.reshape(nc, spec.MAX_OFFSET_BINS)

    w = hist[:, :-1] + hist[:, 1:]
    aligned = w.max(axis=1).astype(np.int32)
    best_b = w.argmax(axis=1)
    dt_win = dt_sum[np.arange(nc), best_b] + dt_sum[np.arange(nc), best_b + 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        offset_frames = np.where(aligned > 0, dt_win / np.maximum(aligned, 1), 0.0)
    offset_sec = (offset_frames / spec.FRAMES_PER_SEC).astype(np.float32)

    # rank: aligned desc, track asc (cand already ascending; stable sort)
    rank = np.argsort(-aligned.astype(np.int64), kind="stable")
    return MatchResult(
        track=cand[rank].astype(np.int32),
        aligned=aligned[rank],
        offset_sec=offset_sec[rank],
    )

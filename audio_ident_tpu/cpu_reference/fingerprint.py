"""NumPy golden fingerprint pipeline (frozen semantics, format v2).

Every stage is written to have an exactly-mirrorable JAX counterpart:

1. framing: frame i covers samples [i*HOP, i*HOP + N_FFT), no centering.
2. periodic Hann window, float32 rFFT magnitude, log with LOG_FLOOR.
3. salience = logmag - boxmean(logmag) over a (±SUB_TIME_RADIUS,
   ±SUB_FREQ_RADIUS) window (zero-padded separable box filter divided by
   the true in-bounds neighbor count).  v2 widened the time radius to
   ±31 frames (temporal whitening — stationary noise floors and reverb
   tails subtract out), independent of the local-max radii.
4. decisions are made on q = floor(salience * SALIENCE_QUANT) as int32.
5. local-max test against the same neighborhood (strict on earlier cells,
   non-strict on later cells is avoided by using q with unique flat-index
   tie-break: a cell is a peak iff its (q, -flat) key is the max of its
   neighborhood, i.e. ties broken toward the lowest flat index).
6. stage-1: per-frame top PEAKS_PER_FRAME_CAP by (q desc, f asc).
   stage-2: global top max_peaks() by (q desc, (t, f) asc) via stable sort.
7. peaks re-sorted by (t asc, f asc); anchor i pairs with the next
   PAIR_LOOKAHEAD peaks, keeping the first FAN_OUT that satisfy
   MIN_DT <= dt <= MAX_DT and |df| <= MAX_DF.
8. hash = (f_anchor << 15) | ((df + 128) << 7) | dt   (24 bits).

Replaces the role of the external ``olaf_c store/query`` fingerprint
extraction (reference: audio-ident-service/app/audio/fingerprint.py:87-219).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from audio_ident_tpu import spec


@dataclass
class Peaks:
    """Selected constellation peaks, sorted by (t, f)."""

    t: np.ndarray  # int32 [K] frame indices (invalid entries = -1)
    f: np.ndarray  # int32 [K] freq bins     (invalid entries = -1)
    valid: np.ndarray  # bool [K]


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (matches jnp definition exactly)."""
    i = np.arange(n, dtype=np.float32)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)).astype(np.float32)


def frame_signal(x: np.ndarray) -> np.ndarray:
    """Frame a 1-D float32 signal into [T, N_FFT] (no padding/centering)."""
    x = np.asarray(x, dtype=np.float32)
    t = spec.num_frames(len(x))
    if t <= 0:
        return np.zeros((0, spec.N_FFT), dtype=np.float32)
    idx = np.arange(t)[:, None] * spec.HOP + np.arange(spec.N_FFT)[None, :]
    return x[idx]


def log_magnitude(frames: np.ndarray) -> np.ndarray:
    """Windowed rFFT log-magnitude, float32, shape [T, N_BINS] (Nyquist
    bin dropped per spec.N_BINS)."""
    win = hann_window(spec.N_FFT)
    fft = np.fft.rfft((frames * win).astype(np.float32), axis=-1)[:, : spec.N_BINS]
    mag = np.abs(fft).astype(np.float32)
    return np.log(mag + np.float32(spec.LOG_FLOOR)).astype(np.float32)


def _box_mean(logmag: np.ndarray) -> np.ndarray:
    """Separable zero-padded box sum / true neighbor count (float32)."""
    t_r, f_r = spec.SUB_TIME_RADIUS, spec.SUB_FREQ_RADIUS
    tdim, fdim = logmag.shape
    # time axis: zero-pad then sliding sum of width 2*t_r+1
    kt = np.ones(2 * t_r + 1, dtype=np.float32)
    kf = np.ones(2 * f_r + 1, dtype=np.float32)
    tmp = np.apply_along_axis(lambda v: np.convolve(v, kt, mode="same"), 0, logmag)
    summed = np.apply_along_axis(lambda v: np.convolve(v, kf, mode="same"), 1, tmp)
    # true in-bounds counts (separable)
    ti = np.arange(tdim)
    fi = np.arange(fdim)
    count_t = np.minimum(ti + t_r, tdim - 1) - np.maximum(ti - t_r, 0) + 1
    count_f = np.minimum(fi + f_r, fdim - 1) - np.maximum(fi - f_r, 0) + 1
    counts = (count_t[:, None] * count_f[None, :]).astype(np.float32)
    return (summed.astype(np.float32) / counts).astype(np.float32)


def quantized_salience(logmag: np.ndarray) -> np.ndarray:
    """q = floor(salience * SALIENCE_QUANT) as int32, [T, N_BINS]."""
    sal = logmag - _box_mean(logmag)
    return np.floor(sal * np.float32(spec.SALIENCE_QUANT)).astype(np.int32)


def tie_key(q: np.ndarray) -> np.ndarray:
    """Composite local-max key: q * 1024 + (t%32)*32 + (f%32), int32.

    The tie term is UNIQUE within any (±PEAK_TIME_RADIUS, ±PEAK_FREQ_RADIUS)
    neighborhood (radii < 32), so ``key == maxpool(key)`` has no ties and the
    peak decision is fully deterministic and platform-mirrorable.
    """
    tdim, fdim = q.shape
    tie = ((np.arange(tdim, dtype=np.int32)[:, None] % 32) * 32) + (
        np.arange(fdim, dtype=np.int32)[None, :] % 32
    )
    return q.astype(np.int32) * 1024 + tie


def _local_max_mask(q: np.ndarray) -> np.ndarray:
    """Peak test: composite key equals the max over its neighborhood."""
    from scipy.ndimage import maximum_filter

    key = tie_key(q)
    size = (2 * spec.PEAK_TIME_RADIUS + 1, 2 * spec.PEAK_FREQ_RADIUS + 1)
    pooled = maximum_filter(key, size=size, mode="constant", cval=np.int32(-(2**31) + 1))
    return key == pooled


def select_peaks(q: np.ndarray, budget: int) -> Peaks:
    """Two-stage deterministic peak selection (see module docstring)."""
    tdim, fdim = q.shape
    if tdim == 0:
        z = np.zeros(budget, dtype=np.int32)
        return Peaks(t=z - 1, f=z - 1, valid=np.zeros(budget, dtype=bool))

    mask = _local_max_mask(q)
    fi = np.arange(fdim)[None, :]
    mask &= (fi >= spec.MIN_FREQ_BIN) & (fi <= spec.MAX_FREQ_BIN)
    mask &= q > 0

    qm = np.where(mask, q, spec.Q_INVALID).astype(np.int64)

    # stage 1: per-frame top-P by (q desc, f asc); key unique per row
    key1 = qm * 1024 + (1023 - np.arange(fdim, dtype=np.int64))[None, :]
    p = spec.PEAKS_PER_FRAME_CAP
    part = np.argsort(-key1, axis=1, kind="stable")[:, :p]  # [T, P] freq idx
    q_sel = np.take_along_axis(qm, part, axis=1)  # [T, P]
    t_sel = np.broadcast_to(np.arange(tdim)[:, None], (tdim, p))
    f_sel = part

    # stage 2: global top-budget by (q desc, (t, f) asc) via stable sort
    q_flat = q_sel.reshape(-1)
    t_flat = t_sel.reshape(-1).astype(np.int64)
    f_flat = f_sel.reshape(-1).astype(np.int64)
    # stable sort on -q with candidates already enumerated in (t, f asc by
    # construction within stage-1?) -- stage-1 emits per frame in f-desc-key
    # order, i.e. f ascending among equal q, frames ascending overall.  To
    # get the frozen (t, f) tie-break exactly, stable-sort candidates by
    # (t * 1024 + f) first, then stable-sort by -q.
    order_tf = np.argsort(t_flat * 1024 + f_flat, kind="stable")
    q_flat, t_flat, f_flat = q_flat[order_tf], t_flat[order_tf], f_flat[order_tf]
    order_q = np.argsort(-q_flat, kind="stable")[:budget]
    q_top, t_top, f_top = q_flat[order_q], t_flat[order_q], f_flat[order_q]
    valid = q_top > 0

    # pad to budget
    k = len(q_top)
    if k < budget:
        pad = budget - k
        t_top = np.concatenate([t_top, np.full(pad, -1, dtype=np.int64)])
        f_top = np.concatenate([f_top, np.full(pad, -1, dtype=np.int64)])
        valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])

    # final ordering for pairing: (t asc, f asc), invalid to the end
    sort_key = np.where(valid, t_top * 1024 + f_top, np.int64(spec.TF_INVALID))
    order = np.argsort(sort_key, kind="stable")
    t_out = np.where(valid[order], t_top[order], -1).astype(np.int32)
    f_out = np.where(valid[order], f_top[order], -1).astype(np.int32)
    return Peaks(t=t_out, f=f_out, valid=valid[order])


def pair_hashes(peaks: Peaks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Anchor-target pairing -> (hashes uint32 [K*L], t_anchor int32, valid)."""
    k = len(peaks.t)
    lk = spec.PAIR_LOOKAHEAD
    t = peaks.t.astype(np.int64)
    f = peaks.f.astype(np.int64)
    v = peaks.valid

    hashes = np.zeros((k, lk), dtype=np.uint32)
    t_anchor = np.zeros((k, lk), dtype=np.int32)
    pair_valid = np.zeros((k, lk), dtype=bool)

    for j in range(1, lk + 1):
        tj = np.full(k, -1, dtype=np.int64)
        fj = np.full(k, -1, dtype=np.int64)
        vj = np.zeros(k, dtype=bool)
        if j < k:
            tj[:-j], fj[:-j], vj[:-j] = t[j:], f[j:], v[j:]
        dt = tj - t
        df = fj - f
        ok = (
            v
            & vj
            & (dt >= spec.MIN_DT)
            & (dt <= spec.MAX_DT)
            & (np.abs(df) <= spec.MAX_DF)
        )
        h = spec.pack_hash_np(f, df, dt)
        hashes[:, j - 1] = np.where(ok, h, 0).astype(np.uint32)
        t_anchor[:, j - 1] = t.astype(np.int32)
        pair_valid[:, j - 1] = ok

    # keep only the first FAN_OUT valid targets per anchor
    keep = pair_valid & (np.cumsum(pair_valid, axis=1) <= spec.FAN_OUT)
    hashes = np.where(keep, hashes, np.uint32(0))
    return (
        hashes.reshape(-1),
        t_anchor.reshape(-1),
        keep.reshape(-1),
    )


def fingerprint_np(
    pcm_16k: np.ndarray, budget: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full golden pipeline: 16 kHz float32 mono -> (hashes, t_anchor, valid).

    Args:
        pcm_16k: 1-D float32 array at 16 kHz.
        budget: peak budget (defaults to spec.max_peaks(len(pcm_16k))).

    Returns:
        hashes: uint32 [budget * PAIR_LOOKAHEAD] (garbage where ~valid)
        t_anchor: int32 frame index of each hash's anchor
        valid: bool mask
    """
    pcm_16k = np.asarray(pcm_16k, dtype=np.float32)
    if budget is None:
        budget = spec.max_peaks(len(pcm_16k))
    frames = frame_signal(pcm_16k)
    if frames.shape[0] == 0:
        n = budget * spec.PAIR_LOOKAHEAD
        return (
            np.zeros(n, dtype=np.uint32),
            np.zeros(n, dtype=np.int32),
            np.zeros(n, dtype=bool),
        )
    logmag = log_magnitude(frames)
    q = quantized_salience(logmag)
    peaks = select_peaks(q, budget)
    return pair_hashes(peaks)


def compact_hashes(
    hashes: np.ndarray, t_anchor: np.ndarray, valid: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Drop invalid entries -> (hashes uint32 [M], t_anchor int32 [M])."""
    return hashes[valid], t_anchor[valid]

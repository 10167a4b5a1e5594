"""Format-v2 peak-stability experiment harness (offline, NumPy, 1-core).

Round-3 verdict item 1: white-noise SNR<=10 dB and mic-capture clips fail
the frozen targets because GLOBAL top-K peak selection lets flat-spectrum
noise peaks displace low-band music peaks (rank churn), and mic-chain
coloration/reverb reshuffles salience ranks.  This harness iterates
candidate *persisted-format* changes (band-local rank competition,
whitening, radii) against the real 1,001-track eval assets without
touching the frozen pipeline.

It mirrors the production matcher semantics exactly where they matter:
probe fanout caps, +/-1-frame adjacent-bin vote windows, query 2x density,
jitter-variant probing, and the score-gap verdict gate
(audio_ident_tpu/spec.py:70-112, index/match.py:126-266).

Usage:
    python scripts/exp_v2.py --variants v1,banded_a --tracks 250
    # caches magnitude spectrograms under .exp_cache/ on first run
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
from scipy.ndimage import maximum_filter

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.service.audio import decode_wav  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
CACHE = ROOT / ".exp_cache"
LIB = ROOT / "eval_lib"
# newest corpus wins (r5 adds full-power pink cells)
CORPUS = next(
    (
        p
        for p in (
            ROOT / "eval_corpus_r5",
            ROOT / "eval_corpus_r4",
            ROOT / "eval_corpus",
        )
        if p.exists()
    ),
    ROOT / "eval_corpus",
)


# ---------------------------------------------------------------------------
# Variant spec
# ---------------------------------------------------------------------------


@dataclass
class Variant:
    name: str
    mode: str = "banded"  # "global" (v1) | "banded"
    time_radius: int = 3
    freq_radius: int = 9
    # banded selection: per (time-block, freq-band) rank competition
    block_frames: int = 64
    band_edges: tuple = (2, 8, 16, 32, 64, 128, 256, 512)
    per_cell: int = 3
    query_factor: int = 2  # query takes per_cell * factor (superset)
    q_min: int = 0  # quantized salience floor (exclusive)
    peaks_per_sec: int = 20  # only used by mode="global"
    # optional wide-band whitening: subtract a freq-smoothed envelope
    # (radius in bins; 0 = off) from logmag before salience
    whiten_radius: int = 0
    # salience subtraction box (defaults to the local-max radii); a WIDE
    # time radius turns the subtraction into temporal whitening that
    # suppresses reverb tails / stationary noise floors
    sub_time_radius: int | None = None
    sub_freq_radius: int | None = None
    # CFAR-style variance normalization (v3 candidate): divide the
    # mean-subtracted salience by the box STD, floored at this value (log
    # units; 0 = off).  Colored noise (pink at low SNR) inflates the
    # local variance in low bins, so spurious noise maxima get scaled
    # down before the global top-K competition instead of displacing
    # true music peaks band-wide.
    cfar_floor_std: float = 0.0
    extras: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# DSP (mirrors cpu_reference/fingerprint.py with variant knobs)
# ---------------------------------------------------------------------------


def magnitude(pcm: np.ndarray) -> np.ndarray:
    """[T, N_BINS] float32 linear magnitude (cache unit; log applied later)."""
    x = np.asarray(pcm, dtype=np.float32)
    t = spec.num_frames(len(x))
    if t <= 0:
        return np.zeros((0, spec.N_BINS), np.float32)
    idx = np.arange(t)[:, None] * spec.HOP + np.arange(spec.N_FFT)[None, :]
    i = np.arange(spec.N_FFT, dtype=np.float32)
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi * i / spec.N_FFT)).astype(np.float32)
    fft = np.fft.rfft((x[idx] * win).astype(np.float32), axis=-1)[:, : spec.N_BINS]
    return np.abs(fft).astype(np.float32)


def box_sum_2d(a: np.ndarray, tr: int, fr: int) -> np.ndarray:
    """Zero-padded box sum over (+/-tr, +/-fr), cumsum-based (fast)."""
    tdim, fdim = a.shape
    c = np.zeros((tdim + 1, fdim + 1), np.float64)
    c[1:, 1:] = np.cumsum(np.cumsum(a, axis=0, dtype=np.float64), axis=1)
    ti = np.arange(tdim)
    fi = np.arange(fdim)
    t0 = np.maximum(ti - tr, 0)
    t1 = np.minimum(ti + tr, tdim - 1) + 1
    f0 = np.maximum(fi - fr, 0)
    f1 = np.minimum(fi + fr, fdim - 1) + 1
    return (
        c[np.ix_(t1, f1)] - c[np.ix_(t0, f1)] - c[np.ix_(t1, f0)] + c[np.ix_(t0, f0)]
    ).astype(np.float32)


def box_mean_2d(a: np.ndarray, tr: int, fr: int) -> np.ndarray:
    tdim, fdim = a.shape
    ti = np.arange(tdim)
    fi = np.arange(fdim)
    ct = np.minimum(ti + tr, tdim - 1) - np.maximum(ti - tr, 0) + 1
    cf = np.minimum(fi + fr, fdim - 1) - np.maximum(fi - fr, 0) + 1
    return box_sum_2d(a, tr, fr) / (ct[:, None] * cf[None, :]).astype(np.float32)


def salience_q(mag: np.ndarray, v: Variant) -> np.ndarray:
    logmag = np.log(mag + np.float32(spec.LOG_FLOOR)).astype(np.float32)
    if v.whiten_radius > 0:
        # per-frame frequency-envelope whitening (wide box along freq only)
        env = box_mean_2d(logmag, 0, v.whiten_radius)
        logmag = logmag - env
    str_ = v.sub_time_radius if v.sub_time_radius is not None else v.time_radius
    sfr = v.sub_freq_radius if v.sub_freq_radius is not None else v.freq_radius
    mean = box_mean_2d(logmag, str_, sfr)
    sal = logmag - mean
    if v.cfar_floor_std > 0.0:
        var = box_mean_2d(logmag * logmag, str_, sfr) - mean * mean
        std = np.sqrt(np.maximum(var, np.float32(v.cfar_floor_std) ** 2))
        sal = sal / std
    return np.floor(sal * np.float32(spec.SALIENCE_QUANT)).astype(np.int32)


def local_max_mask(q: np.ndarray, tr: int, fr: int) -> np.ndarray:
    tdim, fdim = q.shape
    tie = ((np.arange(tdim, dtype=np.int32)[:, None] % 32) * 32) + (
        np.arange(fdim, dtype=np.int32)[None, :] % 32
    )
    key = q.astype(np.int64) * 1024 + tie
    pooled = maximum_filter(
        key, size=(2 * tr + 1, 2 * fr + 1), mode="constant", cval=np.int64(-(2**62))
    )
    return key == pooled


def select_peaks_variant(q: np.ndarray, v: Variant, query: bool) -> tuple:
    """-> (t[int32], f[int32]) sorted by (t, f)."""
    tdim, fdim = q.shape
    if tdim == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    mask = local_max_mask(q, v.time_radius, v.freq_radius)
    fi = np.arange(fdim)[None, :]
    mask &= (fi >= spec.MIN_FREQ_BIN) & (fi <= spec.MAX_FREQ_BIN)
    mask &= q > v.q_min

    tt, ff = np.nonzero(mask)
    qq = q[tt, ff].astype(np.int64)

    if v.mode == "global":
        # v1: per-frame cap then global budget by (q desc, (t,f) asc)
        order = np.lexsort((ff, tt, -qq))  # q desc, then t, f asc
        tt, ff, qq = tt[order], ff[order], qq[order]
        # per-frame cap
        o2 = np.lexsort((-qq, tt))
        rank_in_frame = _cumcount(tt[o2])
        keep2 = np.zeros(len(tt), bool)
        keep2[o2] = rank_in_frame < spec.PEAKS_PER_FRAME_CAP
        tt, ff, qq = tt[keep2], ff[keep2], qq[keep2]
        dur_frames = tdim + (spec.N_FFT // spec.HOP) - 1
        budget = max(int(round(dur_frames / spec.FRAMES_PER_SEC * v.peaks_per_sec)), 8)
        if query:
            budget *= v.query_factor
        order = np.lexsort((ff, tt, -qq))[:budget]
        tt, ff = tt[order], ff[order]
    else:
        band = np.searchsorted(np.asarray(v.band_edges), ff, side="right") - 1
        cell = (tt // v.block_frames).astype(np.int64) * 64 + band
        # rank within cell by (q desc, (t, f) asc)
        o = np.lexsort((ff, tt, -qq, cell))
        rank = _cumcount(cell[o])
        quota = v.per_cell * (v.query_factor if query else 1)
        keep = np.zeros(len(tt), bool)
        keep[o] = rank < quota
        tt, ff = tt[keep], ff[keep]

    o = np.lexsort((ff, tt))
    return tt[o].astype(np.int32), ff[o].astype(np.int32)


def _cumcount(sorted_keys: np.ndarray) -> np.ndarray:
    """Position within each equal-key run of an already-sorted key array."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, np.int64)
    starts = np.zeros(n, bool)
    starts[0] = True
    starts[1:] = sorted_keys[1:] != sorted_keys[:-1]
    idx = np.arange(n)
    run_start = np.maximum.accumulate(np.where(starts, idx, 0))
    return idx - run_start


def pair_hashes_np(t: np.ndarray, f: np.ndarray) -> tuple:
    """(hashes uint32, t_anchor int32) — same pairing as the frozen spec."""
    k = len(t)
    if k == 0:
        return np.zeros(0, np.uint32), np.zeros(0, np.int32)
    t64 = t.astype(np.int64)
    f64 = f.astype(np.int64)
    hs, ts = [], []
    n_taken = np.zeros(k, np.int32)
    for j in range(1, spec.PAIR_LOOKAHEAD + 1):
        dt = np.full(k, -1, np.int64)
        df = np.zeros(k, np.int64)
        if j < k:
            dt[:-j] = t64[j:] - t64[:-j]
            df[:-j] = f64[j:] - f64[:-j]
        ok = (
            (dt >= spec.MIN_DT)
            & (dt <= spec.MAX_DT)
            & (np.abs(df) <= spec.MAX_DF)
            & (n_taken < spec.FAN_OUT)
        )
        n_taken += ok
        h = spec.pack_hash_np(f64, df, dt)
        hs.append(np.where(ok, h, 0)[ok])
        ts.append(t64[ok])
    return (
        np.concatenate(hs).astype(np.uint32),
        np.concatenate(ts).astype(np.int32),
    )


def fingerprint_variant(mag: np.ndarray, v: Variant, query: bool) -> tuple:
    q = salience_q(mag, v)
    t, f = select_peaks_variant(q, v, query)
    return pair_hashes_np(t, f)


# ---------------------------------------------------------------------------
# Matching (mirrors index/match.py semantics)
# ---------------------------------------------------------------------------


def expand_jitter_np(h: np.ndarray, t: np.ndarray) -> tuple:
    f = h >> spec.F_ANCHOR_SHIFT
    dfb = (h >> spec.DF_SHIFT) & ((1 << (spec.F_ANCHOR_SHIFT - spec.DF_SHIFT)) - 1)
    dt = h & ((1 << spec.DF_SHIFT) - 1)
    df = dfb - spec.DF_BIAS
    f_t = f + df
    outs_h, outs_t = [], []
    for da, dtf, ddt in spec.QUERY_JITTER_VARIANTS:
        f2 = f + da
        df2 = df - da + dtf
        dt2 = dt + ddt
        ft2 = f_t + dtf
        ok = (
            (f2 >= spec.MIN_FREQ_BIN) & (f2 <= spec.MAX_FREQ_BIN)
            & (ft2 >= spec.MIN_FREQ_BIN) & (ft2 <= spec.MAX_FREQ_BIN)
            & (np.abs(df2) <= spec.MAX_DF)
            & (dt2 >= spec.MIN_DT) & (dt2 <= spec.MAX_DT)
        )
        h2 = (f2 << spec.F_ANCHOR_SHIFT) | ((df2 + spec.DF_BIAS) << spec.DF_SHIFT) | dt2
        outs_h.append(h2[ok].astype(np.int64))
        outs_t.append(t[ok])
    return np.concatenate(outs_h), np.concatenate(outs_t)


class ExpIndex:
    """Sorted-postings index with the production probe-fanout cap."""

    def __init__(self):
        self._h, self._r, self._t = [], [], []

    def add(self, row: int, hashes: np.ndarray, times: np.ndarray) -> None:
        self._h.append(hashes.astype(np.int64))
        self._r.append(np.full(len(hashes), row, np.int32))
        self._t.append(times.astype(np.int32))

    def finalize(self) -> None:
        h = np.concatenate(self._h)
        r = np.concatenate(self._r)
        t = np.concatenate(self._t)
        o = np.lexsort((t, r, h))
        self.h, self.r, self.t = h[o], r[o], t[o]
        self.n_rows = int(self.r.max()) + 1 if len(self.r) else 0

    def match(self, q_hash: np.ndarray, q_time: np.ndarray, fanout: int) -> tuple:
        """-> (aligned_per_track int32[n_rows], offset_frames_of_best)"""
        qh, qt = expand_jitter_np(q_hash.astype(np.int64), q_time)
        lo = np.searchsorted(self.h, qh, side="left")
        hi = np.searchsorted(self.h, qh, side="right")
        # strided probe (spec.py PROBE_FANOUT notes): sample `fanout`
        # positions evenly across each chain — unbiased at any scale
        ln = hi - lo
        pos_list, rep_list = [], []
        k = np.arange(fanout, dtype=np.int64)
        for i in np.nonzero(ln > 0)[0]:
            n = ln[i]
            if n <= fanout:
                idx = k[:n]
            else:
                idx = (k * n) // fanout + (int(qh[i]) % n)
                idx = np.where(idx >= n, idx - n, idx)
            pos_list.append(lo[i] + idx)
            rep_list.append(np.full(len(idx), i, np.int64))
        counts_any = bool(pos_list)
        pos = np.concatenate(pos_list) if counts_any else np.zeros(0, np.int64)
        rep = np.concatenate(rep_list) if counts_any else np.zeros(0, np.int64)
        if len(pos) == 0:
            return np.zeros(self.n_rows, np.int32), np.zeros(self.n_rows, np.int32)
        vt = self.r[pos]
        off = self.t[pos].astype(np.int64) - qt[rep].astype(np.int64)
        b = off + spec.OFFSET_BIN_NEG
        okm = b >= 0
        vt, b = vt[okm], b[okm]
        key = vt.astype(np.int64) * (1 << 20) + b
        uk, cnt = np.unique(key, return_counts=True)
        # adjacent-bin window: score[k] = cnt[k] + cnt[k+1]
        nxt = np.searchsorted(uk, uk + 1)
        has_next = (nxt < len(uk)) & (uk[np.minimum(nxt, len(uk) - 1)] == uk + 1)
        win = cnt + np.where(has_next, cnt[np.minimum(nxt, len(uk) - 1)], 0)
        trk = (uk >> 20).astype(np.int32)
        aligned = np.zeros(self.n_rows, np.int32)
        best_bin = np.zeros(self.n_rows, np.int32)
        o = np.lexsort((-win, trk))
        trk_s, win_s, bin_s = trk[o], win[o], (uk[o] & ((1 << 20) - 1))
        first = np.zeros(len(trk_s), bool)
        if len(trk_s):
            first[0] = True
            first[1:] = trk_s[1:] != trk_s[:-1]
        aligned[trk_s[first]] = win_s[first]
        best_bin[trk_s[first]] = bin_s[first]
        return aligned, best_bin


def verdict_gate(aligned: np.ndarray) -> tuple:
    """Production accept logic -> (accepted, top_row, top_aligned)."""
    if aligned.max(initial=0) < spec.MIN_ALIGNED_HASHES:
        return False, -1, 0
    top = int(np.argmax(aligned))
    a_top = int(aligned[top])
    rest = aligned.copy()
    rest[top] = 0
    runner = int(rest.max(initial=0))
    ok = (a_top >= spec.STRONG_ACCEPT_ALIGNED) or (
        a_top >= spec.MATCH_MARGIN_RATIO * max(runner, 1)
    )
    return ok, top, a_top


# ---------------------------------------------------------------------------
# Corpus plumbing
# ---------------------------------------------------------------------------


def load_gt() -> list[dict]:
    with (CORPUS / "ground_truth.csv").open() as fh:
        return list(csv.DictReader(fh))


def mag_cached(wav_path: Path, pad_to: int | None = None) -> np.ndarray:
    CACHE.mkdir(exist_ok=True)
    key = wav_path.stem + (f"_p{pad_to}" if pad_to else "")
    npy = CACHE / f"{key}.npy"
    if npy.exists():
        return np.load(npy, mmap_mode="r")
    pcm = decode_wav(wav_path.read_bytes()).pcm
    if pad_to and len(pcm) < pad_to:
        pcm = np.concatenate([pcm, np.zeros(pad_to - len(pcm), np.float32)])
    m = magnitude(pcm)
    np.save(npy, m)
    return m


def query_bucket_samples(n: int) -> int:
    dur = n / spec.SAMPLE_RATE
    for b in spec.QUERY_BUCKETS_SEC:
        if dur <= b:
            return b * spec.SAMPLE_RATE
    return spec.QUERY_BUCKETS_SEC[-1] * spec.SAMPLE_RATE


def evaluate_variant(v: Variant, gt: list[dict], lib_tracks: list[str]) -> dict:
    t0 = time.time()
    row_of = {name: i for i, name in enumerate(lib_tracks)}
    index = ExpIndex()
    n_hashes = 0
    for name in lib_tracks:
        m = mag_cached(LIB / f"{name}.wav")
        h, t = fingerprint_variant(np.asarray(m), v, query=False)
        index.add(row_of[name], h, t)
        n_hashes += len(h)
    index.finalize()
    t_build = time.time() - t0

    per_env_hits: dict[str, list[int]] = {}
    mic_top5: list[int] = []
    aligned_true: dict[str, list[int]] = {}
    margins: dict[str, list[float]] = {}
    neg_total = neg_acc = 0
    t0 = time.time()
    for row in gt:
        clip = CORPUS / row["clip"]
        pcm_n = len(decode_wav(clip.read_bytes()).pcm)
        m = mag_cached(clip, pad_to=query_bucket_samples(pcm_n))
        qh, qt = fingerprint_variant(np.asarray(m), v, query=True)
        aligned, _bins = index.match(qh, qt, spec.PROBE_FANOUT_MAIN)
        ok, top, a_top = verdict_gate(aligned)
        if row["type"] == "negative":
            neg_total += 1
            neg_acc += int(ok)
            continue
        env = row["environment"]
        true_row = row_of.get(row["source"])
        hit = int(ok and top == true_row)
        per_env_hits.setdefault(env, []).append(hit)
        a_true = int(aligned[true_row]) if true_row is not None else 0
        rest = aligned.copy()
        if true_row is not None:
            rest[true_row] = 0
        aligned_true.setdefault(env, []).append(a_true)
        margins.setdefault(env, []).append(a_true / max(int(rest.max(initial=0)), 1))
        if env == "mic":
            order = np.argsort(-aligned)[:5]
            mic_top5.append(int(ok and true_row in set(order.tolist())))
    t_query = time.time() - t0

    def rate(xs):
        return round(sum(xs) / len(xs), 3) if xs else None

    envs = {e: rate(h) for e, h in sorted(per_env_hits.items())}
    return {
        "variant": v.name,
        "envs": envs,
        "top1_mic": envs.get("mic"),
        "top5_mic": rate(mic_top5),
        "fpr": round(neg_acc / neg_total, 3) if neg_total else None,
        "db_hashes_per_track": round(n_hashes / max(len(lib_tracks), 1)),
        "aligned_true_mic": round(float(np.mean(aligned_true.get("mic", [0]))), 1),
        "aligned_true_snr0w": round(float(np.mean(aligned_true.get("snr0-white", [0]))), 1),
        "margin_mic": round(float(np.median(margins.get("mic", [0]))), 1),
        "t_build_s": round(t_build, 1),
        "t_query_s": round(t_query, 1),
    }


VARIANTS = {
    "v1": Variant("v1", mode="global"),
    "banded_a": Variant("banded_a"),
    "banded_b": Variant("banded_b", per_cell=4),
    "banded_w": Variant("banded_w", whiten_radius=48),
    "banded_wq": Variant("banded_wq", whiten_radius=48, q_min=32),
    # v1-style global selection + signal-conditioning levers
    "global_w": Variant("global_w", mode="global", whiten_radius=48),
    "global_tw": Variant("global_tw", mode="global", sub_time_radius=31),
    "global_d30": Variant("global_d30", mode="global", peaks_per_sec=30),
    "global_w_d30": Variant(
        "global_w_d30", mode="global", whiten_radius=48, peaks_per_sec=30
    ),
    "global_tw_d30": Variant(
        "global_tw_d30", mode="global", sub_time_radius=31, peaks_per_sec=30
    ),
    # time-whitening radius / freq-radius sweep around the tw winner
    "tw15": Variant("tw15", mode="global", sub_time_radius=15),
    "tw63": Variant("tw63", mode="global", sub_time_radius=63),
    "tw31_f18": Variant(
        "tw31_f18", mode="global", sub_time_radius=31, sub_freq_radius=18
    ),
    "tw31_q64": Variant("tw31_q64", mode="global", sub_time_radius=31, q_min=64),
    # refinements around the tw31+d30 winner
    "tw15_d30": Variant(
        "tw15_d30", mode="global", sub_time_radius=15, peaks_per_sec=30
    ),
    "tw63_d30": Variant(
        "tw63_d30", mode="global", sub_time_radius=63, peaks_per_sec=30
    ),
    "tw31_f18_d30": Variant(
        "tw31_f18_d30", mode="global", sub_time_radius=31, sub_freq_radius=18,
        peaks_per_sec=30,
    ),
    "tw31_d25": Variant(
        "tw31_d25", mode="global", sub_time_radius=31, peaks_per_sec=25
    ),
    # v3 candidates (round 4): CFAR variance normalization on top of the
    # production v2 settings (tw31 + 30 peaks/s), floor-std sweep
    "v2": Variant(
        "v2", mode="global", sub_time_radius=31, peaks_per_sec=30
    ),
    "cfar25": Variant(
        "cfar25", mode="global", sub_time_radius=31, peaks_per_sec=30,
        cfar_floor_std=0.25,
    ),
    "cfar50": Variant(
        "cfar50", mode="global", sub_time_radius=31, peaks_per_sec=30,
        cfar_floor_std=0.5,
    ),
    "cfar100": Variant(
        "cfar100", mode="global", sub_time_radius=31, peaks_per_sec=30,
        cfar_floor_std=1.0,
    ),
    # v3 candidates (round 5, pink-noise floor): the failure physics is
    # BAND COVERAGE — music energy (and so the clean db constellation)
    # concentrates in low bands, pink noise masks exactly those bands, and
    # the query's surviving high-band peaks find no db counterpart.  Two
    # families attack that: frequency-envelope whitening (flattens the
    # music's own tilt at ingest so high-band peaks win db slots) and
    # banded quotas (hard per-band coverage).
    "v2w48": Variant(
        "v2w48", mode="global", sub_time_radius=31, peaks_per_sec=30,
        whiten_radius=48,
    ),
    "v2w96": Variant(
        "v2w96", mode="global", sub_time_radius=31, peaks_per_sec=30,
        whiten_radius=96,
    ),
    "v2w24": Variant(
        "v2w24", mode="global", sub_time_radius=31, peaks_per_sec=30,
        whiten_radius=24,
    ),
    "banded_tw": Variant("banded_tw", sub_time_radius=31),
    "banded_tw4": Variant("banded_tw4", sub_time_radius=31, per_cell=4),
    "v2w48_cfar50": Variant(
        "v2w48_cfar50", mode="global", sub_time_radius=31, peaks_per_sec=30,
        whiten_radius=48, cfar_floor_std=0.5,
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="v1,banded_a")
    ap.add_argument("--tracks", type=int, default=250)
    ap.add_argument("--envs", default=None, help="restrict eval to these envs")
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()

    gt = load_gt()
    if args.envs:
        keep = set(args.envs.split(","))
        gt = [r for r in gt if r["environment"] in keep or r["type"] == "negative"]
    sources = sorted({r["source"] for r in gt if r["type"] == "positive"})
    all_tracks = sorted(p.stem for p in LIB.glob("*.wav"))
    distractors = [t for t in all_tracks if t not in set(sources)]
    lib = sources + distractors[: max(args.tracks - len(sources), 0)]
    print(f"library: {len(lib)} tracks ({len(sources)} sources), "
          f"{len(gt)} clips", flush=True)

    results = []
    for name in args.variants.split(","):
        v = VARIANTS[name]
        r = evaluate_variant(v, gt, lib)
        results.append(r)
        print(json.dumps(r), flush=True)
    if args.json:
        args.json.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

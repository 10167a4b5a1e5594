"""JAX fingerprint pipeline: STFT -> salience -> peaks -> landmark hashes.

Exact mirror of ``audio_ident_tpu.cpu_reference.fingerprint`` (the parity
oracle); every selection decision is made on quantized int32 keys so that
TPU float noise (FFT rounding, reduce-window order) almost never flips a
decision vs the NumPy golden path.  See spec.py for the frozen constants.

This is the vectorized XLA formulation; the fully-fused Pallas front-end
(ops/fused_frontend.py) replaces everything from PCM framing through
per-frame peak selection with one VMEM-resident grid-tiled kernel on TPU.

TPU-first design notes:
- all shapes static per duration bucket (spec.QUERY_BUCKETS_SEC);
- the STFT is expressed as a real matmul against precomputed DFT bases so
  it lands on the MXU (jnp.fft.rfft lowers to a slower generic FFT on TPU
  for batch-of-1024 sizes); bf16 is NOT used here because hash decisions
  are quantized from f32 log-magnitudes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_ident_tpu import spec


# ---------------------------------------------------------------------------
# Front-end: framing + windowed rFFT magnitude (MXU matmul formulation)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _dft_bases() -> np.ndarray:
    """Precompute the combined windowed DFT basis [N_FFT, 2*N_BINS] f32.

    mag[t, k] = |sum_n w[n] x[t, n] e^{-2πi n k / N}| — columns [0, 512) are
    the cos (real) basis, [512, 1024) the sin (imag) basis, Hann folded in.
    With N_BINS=512 this is a single MXU-perfect [1024, 1024] contraction.
    """
    n = spec.N_FFT
    i = np.arange(n, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)
    k = np.arange(spec.N_BINS, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(i, k) / n
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * win[:, None]).astype(np.float32)
    return np.concatenate([cos_b, sin_b], axis=1)


def frame_signal_jax(x: jnp.ndarray) -> jnp.ndarray:
    """Frame 1-D signal [S] -> [T, N_FFT] (static T from static S).

    HOP divides N_FFT, so frames are built from N_FFT//HOP shifted views of
    the hop-reshaped signal — pure slices + concat, no gather (gathers of
    [T, 1024] indices are an HBM-bandwidth disaster on TPU).
    """
    t = spec.num_frames(x.shape[0])
    if t <= 0:
        return jnp.zeros((0, spec.N_FFT), jnp.float32)
    ratio = spec.N_FFT // spec.HOP  # 4
    need = (t - 1) + ratio  # hop-blocks required
    x = x[: need * spec.HOP]
    y = x.reshape(need, spec.HOP)
    parts = [y[i : i + t] for i in range(ratio)]
    return jnp.concatenate(parts, axis=1)


@functools.lru_cache(maxsize=1)
def _split_bases() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Radix-2 DFT split: (even_basis, odd_basis [512, 514], tw_re, tw_im).

    X[k] = E[k] + w^k O[k] with E/O the 512-point DFTs of the window-folded
    even/odd samples.  Real input gives E[k] = conj(E[512-k]), so each
    512-DFT computes only bins 0..256 (514 real columns) and the rest
    mirror — HALF the MXU FLOPs of the dense [1024, 1024] formulation.
    """
    n = spec.N_FFT
    half = n // 2
    i = np.arange(n, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)
    k = np.arange(half // 2 + 1, dtype=np.float64)  # 257 bins
    m = np.arange(half, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(m, k) / half
    even = np.concatenate(
        [np.cos(ang) * win[0::2][:, None], np.sin(ang) * win[0::2][:, None]], axis=1
    ).astype(np.float32)
    odd = np.concatenate(
        [np.cos(ang) * win[1::2][:, None], np.sin(ang) * win[1::2][:, None]], axis=1
    ).astype(np.float32)
    kk = np.arange(half, dtype=np.float64)  # output bins 0..511
    tw = np.exp(-2j * np.pi * kk / n)
    return even, odd, tw.real.astype(np.float32), tw.imag.astype(np.float32)


def _logmag_split(frames: jnp.ndarray) -> jnp.ndarray:
    """Split-radix log-magnitude (2x fewer MXU FLOPs than the dense DFT)."""
    even_b, odd_b, tw_re, tw_im = _split_bases()
    half = spec.N_FFT // 2
    nb = half // 2 + 1  # 257

    fe = frames[..., 0::2]
    fo = frames[..., 1::2]
    oe = jnp.dot(fe, jnp.asarray(even_b), precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    oo = jnp.dot(fo, jnp.asarray(odd_b), precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    e_re, e_im = oe[..., :nb], oe[..., nb:]
    o_re, o_im = oo[..., :nb], oo[..., nb:]

    # mirror conjugate symmetry to bins 0..511: for k in 257..511,
    # E[k] = conj(E[512-k]); flip bins 1..255
    def full_bins(re, im):
        re_full = jnp.concatenate([re, re[..., 1:half - nb + 1][..., ::-1]], axis=-1)
        im_full = jnp.concatenate([im, -im[..., 1:half - nb + 1][..., ::-1]], axis=-1)
        return re_full, im_full

    e_re, e_im = full_bins(e_re, e_im)
    o_re, o_im = full_bins(o_re, o_im)

    tw_re_j = jnp.asarray(tw_re)
    tw_im_j = jnp.asarray(tw_im)
    re = e_re + tw_re_j * o_re - tw_im_j * o_im
    im = e_im + tw_re_j * o_im + tw_im_j * o_re
    mag = jnp.sqrt(re * re + im * im)
    return jnp.log(mag + jnp.float32(spec.LOG_FLOOR))


def log_magnitude_jax(
    frames: jnp.ndarray, use_fft: bool = False, split: bool = False
) -> jnp.ndarray:
    """Windowed rFFT log-magnitude [T, N_BINS] (float32).

    Default: the dense [1024, 1024] MXU contraction.  Measured
    alternatives, both SLOWER on this chip and kept only for the record:
    ``use_fft=True`` (jnp.fft.rfft, 2x slower) and ``split=True`` (radix-2
    even/odd split — halves MXU FLOPs and is hash-identical on every
    tested clip, but the mirror/twiddle elementwise chain costs more HBM
    traffic than the matmul it saves: 111 ms vs 87 ms at B=512, and OOMs
    at B=2048).
    """
    if split and not use_fft:
        return _logmag_split(frames)
    if use_fft:
        i = jnp.arange(spec.N_FFT, dtype=jnp.float32)
        win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * i / spec.N_FFT)
        fft = jnp.fft.rfft(frames * win, axis=-1)[..., : spec.N_BINS]
        mag = jnp.abs(fft).astype(jnp.float32)
    else:
        # Precision.HIGHEST is required: the default matmul precision
        # downcasts operands (bf16 passes on TPU) and the resulting
        # ~1e-1 log-magnitude error destroys CPU/TPU hash parity
        # (HIGH was measured to flip ~3% of hashes on some clips).
        out = jnp.dot(
            frames,
            jnp.asarray(_dft_bases()),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        re = out[..., : spec.N_BINS]
        im = out[..., spec.N_BINS :]
        mag = jnp.sqrt(re * re + im * im)
    return jnp.log(mag + jnp.float32(spec.LOG_FLOOR))


# ---------------------------------------------------------------------------
# Salience + peak selection
# ---------------------------------------------------------------------------


def _win_reduce(a, axis: int, out_len: int, terms: int, stride: int, op):
    """``out[c] = op-fold of a[c + j*stride] for j in [0, terms)`` along
    ``axis``, built from shifted slices with a FIXED hierarchical grouping:
    groups of 3 are folded into a pyramid (s3 -> s9 -> s27 ...), so a
    63-wide window costs 8 shifted ops instead of 62 and a 19-wide one 6
    instead of 18.  The grouping is part of the frozen arithmetic: the XLA
    path and the fused Pallas kernel both execute THIS expression tree, so
    their f32 roundings are bit-identical (for integer ops the grouping is
    exact anyway)."""

    def sl(arr, s, ln):
        return arr[s : s + ln] if axis == 0 else arr[:, s : s + ln]

    if terms <= 4:
        r = sl(a, 0, out_len)
        for j in range(1, terms):
            r = op(r, sl(a, j * stride, out_len))
        return r
    q, rem = divmod(terms, 3)
    ln3 = out_len + stride * 3 * (q - 1)
    s3 = op(op(sl(a, 0, ln3), sl(a, stride, ln3)), sl(a, 2 * stride, ln3))
    r = _win_reduce(s3, axis, out_len, q, 3 * stride, op)
    for j in range(rem):
        r = op(r, sl(a, (3 * q + j) * stride, out_len))
    return r


def box_reduce_2d(x, t_r: int, f_r: int, op=jnp.add, pad_value=0):
    """Separable (2*t_r+1) x (2*f_r+1) windowed reduction of [T, F] with
    constant padding, via the hierarchical shifted-slice grouping above.
    Shared by the XLA salience path and the fused Pallas kernel (jnp ops
    trace fine inside pallas)."""
    tdim, fdim = x.shape
    xp = jnp.pad(x, ((t_r, t_r), (0, 0)), constant_values=pad_value)
    st = _win_reduce(xp, 0, tdim, 2 * t_r + 1, 1, op)
    sp = jnp.pad(st, ((0, 0), (f_r, f_r)), constant_values=pad_value)
    return _win_reduce(sp, 1, fdim, 2 * f_r + 1, 1, op)


def _box_mean_jax(logmag: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded box sum / true neighbor count (mirrors _box_mean)."""
    t_r, f_r = spec.SUB_TIME_RADIUS, spec.SUB_FREQ_RADIUS
    tdim, fdim = logmag.shape
    summed = box_reduce_2d(logmag, t_r, f_r)
    ti = jnp.arange(tdim)
    fi = jnp.arange(fdim)
    count_t = jnp.minimum(ti + t_r, tdim - 1) - jnp.maximum(ti - t_r, 0) + 1
    count_f = jnp.minimum(fi + f_r, fdim - 1) - jnp.maximum(fi - f_r, 0) + 1
    counts = (count_t[:, None] * count_f[None, :]).astype(jnp.float32)
    return summed / counts


def quantized_salience_jax(logmag: jnp.ndarray) -> jnp.ndarray:
    """q = floor(salience * SALIENCE_QUANT) int32 (mirrors golden)."""
    sal = logmag - _box_mean_jax(logmag)
    return jnp.floor(sal * jnp.float32(spec.SALIENCE_QUANT)).astype(jnp.int32)


def _tie_key_jax(q: jnp.ndarray) -> jnp.ndarray:
    tdim, fdim = q.shape
    tt = (jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 0) % 32) * 32
    ff = jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 1) % 32
    return q * 1024 + tt + ff


def _local_max_mask_jax(q: jnp.ndarray) -> jnp.ndarray:
    key = _tie_key_jax(q)
    pooled = box_reduce_2d(
        key,
        spec.PEAK_TIME_RADIUS,
        spec.PEAK_FREQ_RADIUS,
        op=jnp.maximum,
        pad_value=-(2**31) + 1,
    )
    return key == pooled


def select_peaks_jax(q: jnp.ndarray, budget: int):
    """Two-stage deterministic peak selection -> (t, f, valid) of [budget]."""
    tdim, fdim = q.shape
    mask = _local_max_mask_jax(q)
    fi = jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 1)
    mask = mask & (fi >= spec.MIN_FREQ_BIN) & (fi <= spec.MAX_FREQ_BIN) & (q > 0)
    qm = jnp.where(mask, q, jnp.int32(spec.Q_INVALID))

    # stage 1: per-frame top-P by unique key (q desc, f asc).  Two local
    # maxima are always > PEAK_FREQ_RADIUS bins apart (each would otherwise
    # lie inside the other's window and lose), so an 8-wide stride-8 max
    # pool keeps EVERY candidate while shrinking the per-frame top_k input
    # 8x (from 512 to 64 lanes).  f stays recoverable from the packed key,
    # so the result is bit-identical to top_k over the full row.
    p = spec.PEAKS_PER_FRAME_CAP
    assert spec.PEAK_FREQ_RADIUS >= 8, "pool width must stay < min peak gap"
    key1 = qm * 1024 + (1023 - fi)
    pooled = jax.lax.reduce_window(
        key1,
        jnp.int32(-(2**31) + 1),
        jax.lax.max,
        window_dimensions=(1, 8),
        window_strides=(1, 8),
        padding="VALID",
    )
    top1, _ = jax.lax.top_k(pooled, p)  # [T, P]
    return select_from_topkeys(top1, budget)


def select_from_topkeys(top1: jnp.ndarray, budget: int):
    """Stage 2 from per-frame packed top-P keys [T, P] (shared with the
    fused Pallas front-end, ops/fused_frontend.py)."""
    tdim, p = top1.shape
    # key = 1024*q + (1023-f) with 0 <= 1023-f < 1024: Python-style modulo
    # recovers f exactly for negative (masked) q as well
    f_sel = 1023 - (top1 % 1024)
    q_sel = (top1 - (top1 % 1024)) // 1024
    t_sel = jax.lax.broadcasted_iota(jnp.int32, (tdim, p), 0)

    # stage 2: select the global top-``budget`` by (q desc, (t,f) asc).
    # The flat candidate array is ordered (t asc, then q desc with f asc
    # among equal q) by stage-1 construction, so (q desc, flat idx asc) is
    # exactly the frozen selection order.  Pack both into ONE uint32 key —
    # q <= 4095 in the top 12 bits, reversed flat idx (< 2^20, enough for
    # 1800 s ingest buckets) in the low 20 — and take a single top_k.
    # (A 4096-bin histogram threshold was ~2x slower: it materialized a
    # [4096, n_cand] compare matrix per clip.)
    q_flat = q_sel.reshape(-1)
    f_flat = f_sel.reshape(-1)
    n_cand = q_flat.shape[0]
    assert n_cand < (1 << 20), "candidate array exceeds the packed-key budget"

    q_ok = q_flat > 0
    qc = jnp.clip(q_flat, 0, 4095).astype(jnp.uint32)
    flat_idx = jnp.arange(n_cand, dtype=jnp.uint32)
    key = jnp.where(
        q_ok, (qc << 20) | (jnp.uint32(0xFFFFF) - flat_idx), jnp.uint32(0)
    )
    k = min(budget, n_cand)
    top_keys, _ = jax.lax.top_k(key, k)
    sel_idx = (jnp.uint32(0xFFFFF) - (top_keys & jnp.uint32(0xFFFFF))).astype(
        jnp.int32
    )
    sel_ok = top_keys != 0

    # recover (t, f) and order by (t, f) asc in one small single-key sort
    sel_t = jnp.where(sel_ok, sel_idx // p, 0)
    sel_f = jnp.where(sel_ok, f_flat[jnp.clip(sel_idx, 0, n_cand - 1)], 0)
    sort_key = jnp.where(sel_ok, sel_t * 1024 + sel_f, jnp.int32(spec.TF_INVALID))
    key_sorted = jax.lax.sort(sort_key)
    if k < budget:
        key_sorted = jnp.pad(
            key_sorted, (0, budget - k), constant_values=spec.TF_INVALID
        )
    valid = key_sorted != jnp.int32(spec.TF_INVALID)
    t_out = jnp.where(valid, key_sorted >> 10, -1)
    f_out = jnp.where(valid, key_sorted & 1023, -1)
    return t_out, f_out, valid


def pair_hashes_jax(t: jnp.ndarray, f: jnp.ndarray, valid: jnp.ndarray):
    """Anchor-target pairing -> (hashes uint32, t_anchor int32, valid)."""
    k = t.shape[0]
    lk = spec.PAIR_LOOKAHEAD
    pad_t = jnp.concatenate([t, jnp.full(lk, -1, jnp.int32)])
    pad_f = jnp.concatenate([f, jnp.full(lk, -1, jnp.int32)])
    pad_v = jnp.concatenate([valid, jnp.zeros(lk, bool)])

    # targets[j-1] = peak shifted by j  -> arrays [K, LK]
    tj = jnp.stack([pad_t[j : j + k] for j in range(1, lk + 1)], axis=1)
    fj = jnp.stack([pad_f[j : j + k] for j in range(1, lk + 1)], axis=1)
    vj = jnp.stack([pad_v[j : j + k] for j in range(1, lk + 1)], axis=1)

    dt = tj - t[:, None]
    df = fj - f[:, None]
    ok = (
        valid[:, None]
        & vj
        & (dt >= spec.MIN_DT)
        & (dt <= spec.MAX_DT)
        & (jnp.abs(df) <= spec.MAX_DF)
    )
    h = (
        (f[:, None].astype(jnp.uint32) << spec.F_ANCHOR_SHIFT)
        | (((df + spec.DF_BIAS).astype(jnp.uint32) & 0xFF) << spec.DF_SHIFT)
        | (dt.astype(jnp.uint32) & 0x7F)
    )
    keep = ok & (jnp.cumsum(ok.astype(jnp.int32), axis=1) <= spec.FAN_OUT)
    hashes = jnp.where(keep, h, jnp.uint32(0))
    t_anchor = jnp.broadcast_to(t[:, None], (k, lk))
    return hashes.reshape(-1), t_anchor.reshape(-1), keep.reshape(-1)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def fingerprint_jax(
    pcm_16k: jnp.ndarray,
    budget: int,
    use_fft: bool = False,
):
    """16 kHz float32 [S] -> (hashes u32 [budget*LK], t_anchor i32, valid).

    Jittable for a static S; batch with ``fingerprint_batch``/vmap (which
    also offers the fused Pallas front-end via ``use_pallas=True``).
    """
    frames = frame_signal_jax(pcm_16k)
    logmag = log_magnitude_jax(frames, use_fft=use_fft)
    q = quantized_salience_jax(logmag)
    t, f, valid = select_peaks_jax(q, budget)
    return pair_hashes_jax(t, f, valid)


def production_use_pallas() -> bool:
    """True when the fused Pallas front-end should serve production
    fingerprinting: any real accelerator backend (Mosaic compiles there);
    the CPU test backend takes the XLA formulation (the Pallas interpreter
    is for parity tests, ~100x slower).  AUDIO_IDENT_FORCE_XLA_FP=1
    forces the XLA path for A/B and debugging."""
    import os

    if os.environ.get("AUDIO_IDENT_FORCE_XLA_FP", "") == "1":
        return False
    return jax.default_backend() != "cpu"


@functools.partial(
    jax.jit, static_argnames=("budget", "use_fft", "use_pallas", "pallas_interpret")
)
def fingerprint_batch(
    pcm_16k: jnp.ndarray,
    budget: int,
    use_fft: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Batched pipeline [B, S] -> (hashes [B, H], t_anchor [B, H], valid).

    ``use_pallas=True`` routes PCM -> frames -> DFT -> peak keys through the
    fully-fused grid-tiled VMEM kernel (ops/fused_frontend.py; bit-identical
    selection, ~10x less HBM traffic); stage 2 + pair hashing stay in XLA.
    """
    if use_pallas:
        from audio_ident_tpu.ops.fused_frontend import fused_topkeys_batch

        keys = fused_topkeys_batch(pcm_16k, interpret=pallas_interpret)

        def one(k):
            t, f, valid = select_from_topkeys(
                k[:, : spec.PEAKS_PER_FRAME_CAP], budget
            )
            return pair_hashes_jax(t, f, valid)

        return jax.vmap(one)(keys)
    return jax.vmap(lambda x: fingerprint_jax(x, budget, use_fft))(pcm_16k)

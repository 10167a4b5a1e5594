"""Fully-fused Pallas front-end: PCM -> frames -> DFT -> peaks, one kernel.

The XLA pipeline materializes every stage in HBM: frames ([B, T, 1024] f32,
~5 GB at the bench batch), the log-magnitude spectrogram, the quantized
salience grid, the tie-key grid and two reduce_window pyramids — ~20 GB of
HBM round trips per 2048-clip batch, against ~2.7 TFLOP of actual MXU work.
This kernel keeps one (clip, frame-tile) of everything VMEM-resident:

    HBM reads :  hop-blocked PCM  (halo DMA per tile)   ~1.3 GB/batch
    HBM writes:  per-frame top-P packed keys [T, 128]   ~0.6 GB/batch

Grid is (batch, n_tiles); each program DMAs its PCM window (with a
``HALO``-frame overlap so box-mean / local-max windows straddling tile
boundaries see true neighbor values), runs the hop-block DFT split (one
[BLK, 256] x [256, 1280] MXU contraction in f32-HIGHEST shared across the
4 frames containing each hop block, combined with exact {+-1, +-i}
twiddles and a 3-tap frequency-domain Hann — see ``_block_dft_basis``),
then runs the identical salience / local-max / per-frame-top-P arithmetic
as the XLA path entirely in VMEM.

Bit-parity contract: identical selection decisions to
``ops.fingerprint.select_peaks_jax`` stage 1 (same quantization, tie keys,
boundary semantics); stage 2 (``select_from_topkeys``) and pair hashing
stay in XLA and consume the packed keys directly.

Mosaic notes (v5e backend): no scatter / strided lane slices / 3-D
reshapes; selection keys are unique per row so iterative masked max ==
exact top-P; all intermediates are 2-D [ROWS, 512].

Reference lineage: replaces the spectral front-end of the external Olaf
binary (reference: audio-ident-service/app/audio/fingerprint.py:30-50);
algorithm spec frozen in audio_ident_tpu/spec.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_ident_tpu import spec

NEG = -(2**31) + 1
MASKED_KEY = -(1 << 30)
OUT_LANES = 128          # VMEM lane width; lanes [0, PEAKS_PER_FRAME_CAP) used
# Tile overlap: center rows need valid box means at +/-PEAK_TIME_RADIUS
# (local-max inputs), each of which needs +/-SUB_TIME_RADIUS of true
# log-magnitude — 8-aligned for sublane-friendly DMA shapes.
HALO = max(
    8,
    -(-(spec.SUB_TIME_RADIUS + spec.PEAK_TIME_RADIUS + 2) // 8) * 8,
)
MAX_TILE = 768           # frames per grid tile (~26 MB/program VMEM; one
                         # tile covers a 10 s clip so its DFT pays the
                         # HALO recompute once, not per tile)
_RATIO = spec.N_FFT // spec.HOP  # 4 hop blocks per frame


def plan_tiles(t_total: int) -> tuple[int, int]:
    """(n_tiles, tile_frames): minimal-waste 8-aligned tiling of T frames."""
    n_tiles = max(1, -(-t_total // MAX_TILE))
    tt = -(-t_total // n_tiles)
    tt = (tt + 7) // 8 * 8
    return n_tiles, tt


@functools.lru_cache(maxsize=1)
def _dft_bases() -> np.ndarray:
    from audio_ident_tpu.ops.fingerprint import _dft_bases as _b

    return _b()


# Hop-block DFT split (round 3).  Frames overlap 4x (N_FFT = 4 * HOP), so
# the UNWINDOWED frame DFT decomposes over hop blocks with twiddles
# e^{-2pi i n k / 4} = i^{-nk} that are exactly {+-1, +-i} — the combine is
# sign flips and re/im swaps, zero multiplies of data by data.  Each hop
# block's 256-point-input DFT is computed ONCE and shared by the 4 frames
# that contain it: 256x1280 MACs per block vs 1024x1024 per frame for the
# dense formulation = 3.2x fewer MXU FLOPs.  The Hann window (periodic,
# 0.5 - 0.5 cos) is applied exactly in the frequency domain as the 3-tap
# convolution X_w[n] = 0.5 X[n] - 0.25 (X[n-1] + X[n+1]) with the real-
# input mirror X[-1] = conj(X[1]) — an identity, not an approximation
# (validated to 1e-13 in f64).  XLA's version of this split was measured
# SLOWER (the mirror/twiddle chain round-trips HBM, ops/fingerprint.py
# log_magnitude_jax docstring); inside the kernel everything stays in
# VMEM, so the saved MXU passes are pure win.  f32 rounding differs from
# the dense contraction — same near-tie-flip class as documented in
# PARITY.md "parity fine print" (the quantized-decision design absorbs it;
# hash sets on the eval corpus are unchanged).
_HS_W = 640              # lane block per component: bins 0..512 + pad to 5*128


@functools.lru_cache(maxsize=1)
def _block_dft_basis() -> np.ndarray:
    """[HOP, 2*_HS_W] f32: cols [0, 513) cos, [640, 1153) sin, bins 0..512.

    D[j, n] = sum_m y[j*HOP + m] e^{-2pi i n m / N_FFT} for n in [0, 512].
    Bin 512 (Nyquist) rides along because the Hann tap at n = 511 needs
    X[512]; lanes 513..639 of each half are zero padding.
    """
    m = np.arange(spec.HOP, dtype=np.float64)
    n = np.arange(spec.N_BINS + 1, dtype=np.float64)  # 513 bins
    ang = -2.0 * np.pi * np.outer(m, n) / spec.N_FFT
    out = np.zeros((spec.HOP, 2 * _HS_W), np.float32)
    out[:, : spec.N_BINS + 1] = np.cos(ang)
    out[:, _HS_W : _HS_W + spec.N_BINS + 1] = np.sin(ang)
    return out


def _make_kernel(tt: int, t_total: int, hopsplit: bool = True):
    rows = tt + 2 * HALO          # frames computed per tile (center + halo)
    blk = rows + _RATIO + 4       # hop blocks DMA'd (pad to 8-multiple slack)
    t_r, f_r = spec.PEAK_TIME_RADIUS, spec.PEAK_FREQ_RADIUS
    s_t, s_f = spec.SUB_TIME_RADIUS, spec.SUB_FREQ_RADIUS
    fdim = spec.N_BINS

    def kernel(y_hbm, basis_ref, out_ref, y_s, fr_s, sem):
        i = pl.program_id(1)
        b = pl.program_id(0)
        copy = pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(i * tt, blk), :], y_s, sem
        )
        copy.start()
        copy.wait()

        if hopsplit:
            # ONE [blk, 256] x [256, 1280] contraction: per-hop-block DFT
            # shared by the 4 frames containing each block (3.2x fewer MXU
            # FLOPs than the dense [rows, 1024] x [1024, 1024] form)
            d = jnp.dot(
                y_s[:],
                basis_ref[:],
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [blk, 2 * _HS_W]
            dre = d[:, :_HS_W]
            dim = d[:, _HS_W:]

            # twiddle combine X[r] = sum_k i^{-nk} D[r+k]: the {+-1, +-i}
            # factors reduce to three lane-constant sign masks
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _HS_W), 1)
            m4 = lane & 3
            one = jnp.float32(1.0)
            s1a = jnp.where(m4 == 0, one, jnp.where(m4 == 2, -one, 0.0))
            s1b = jnp.where(m4 == 1, one, jnp.where(m4 == 3, -one, 0.0))
            s2 = jnp.where((lane & 1) == 0, one, -one)
            d0re, d1re = dre[0:rows], dre[1 : rows + 1]
            d2re, d3re = dre[2 : rows + 2], dre[3 : rows + 3]
            d0im, d1im = dim[0:rows], dim[1 : rows + 1]
            d2im, d3im = dim[2 : rows + 2], dim[3 : rows + 3]
            xre = d0re + s1a * (d1re + d3re) + s1b * (d1im - d3im) + s2 * d2re
            xim = d0im + s1a * (d1im + d3im) - s1b * (d1re - d3re) + s2 * d2im

            # periodic-Hann as the exact 3-tap bin convolution
            # X_w[n] = 0.5 X[n] - 0.25 (X[n-1] + X[n+1]), X[-1] = conj(X[1])
            lane_f = jax.lax.broadcasted_iota(jnp.int32, (rows, fdim), 1)
            r_re = xre[:, 1 : fdim + 1]
            r_im = xim[:, 1 : fdim + 1]
            l_re = jnp.pad(xre[:, : fdim - 1], ((0, 0), (1, 0)))
            l_im = jnp.pad(xim[:, : fdim - 1], ((0, 0), (1, 0)))
            l_re = jnp.where(lane_f == 0, r_re, l_re)
            l_im = jnp.where(lane_f == 0, -r_im, l_im)
            re = jnp.float32(0.5) * xre[:, :fdim] - jnp.float32(0.25) * (
                l_re + r_re
            )
            im = jnp.float32(0.5) * xim[:, :fdim] - jnp.float32(0.25) * (
                l_im + r_im
            )
        else:
            # frames[r] = concat(y[r], .., y[r+3]): assemble via shifted
            # stores into a frames scratch (Mosaic relayouts stores; it
            # cannot yet lane-concat sublane-shifted vectors), then ONE
            # [rows, 1024] x [1024, 1024] contraction — the same K=1024
            # accumulation order as the XLA path
            y = y_s[:]
            for k in range(_RATIO):
                fr_s[:, k * spec.HOP : (k + 1) * spec.HOP] = y[k : k + rows]
            out = jnp.dot(
                fr_s[:],
                basis_ref[:],
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [rows, 2 * N_BINS]
            re = out[:, :fdim]
            im = out[:, fdim:]
        mag = jnp.sqrt(re * re + im * im)
        lm = jnp.log(mag + jnp.float32(spec.LOG_FLOOR))

        gt = i * tt - HALO + jax.lax.broadcasted_iota(jnp.int32, (rows, fdim), 0)
        fi = jax.lax.broadcasted_iota(jnp.int32, (rows, fdim), 1)
        in_clip = (gt >= 0) & (gt < t_total)
        lm = jnp.where(in_clip, lm, jnp.float32(0.0))

        # --- box mean: zero-padded shifted adds / true neighbor count ------
        # (box_reduce_2d is the SAME hierarchical expression tree the XLA
        # path executes, so f32 roundings are bit-identical; rows whose
        # box window reaches outside the scratch are never consumed — the
        # HALO leaves slack beyond the local-max + subtraction reach)
        from audio_ident_tpu.ops.fingerprint import box_reduce_2d

        sf = box_reduce_2d(lm, s_t, s_f)

        gtc = jnp.clip(gt, 0, t_total - 1)
        count_t = (
            jnp.minimum(gtc + s_t, t_total - 1) - jnp.maximum(gtc - s_t, 0) + 1
        )
        count_f = jnp.minimum(fi + s_f, fdim - 1) - jnp.maximum(fi - s_f, 0) + 1
        mean = sf / jnp.maximum(count_t * count_f, 1).astype(jnp.float32)

        q = jnp.floor((lm - mean) * jnp.float32(spec.SALIENCE_QUANT)).astype(
            jnp.int32
        )
        key = q * 1024 + (gtc % 32) * 32 + (fi % 32)
        key = jnp.where(in_clip, key, jnp.int32(NEG))

        # --- local max over the peak window (int32 max: any grouping is
        # exact, so the hierarchical tree is a pure op-count win) ----------
        mf = box_reduce_2d(key, t_r, f_r, op=jnp.maximum, pad_value=NEG)

        is_peak = (
            (key == mf)
            & (fi >= spec.MIN_FREQ_BIN)
            & (fi <= spec.MAX_FREQ_BIN)
            & (q > 0)
            & in_clip
        )
        key1 = jnp.where(is_peak, q * 1024 + (1023 - fi), jnp.int32(MASKED_KEY))
        center = key1[HALO : HALO + tt]

        # --- per-frame top-P by iterative masked max (keys unique per row) -
        out_lanes = jax.lax.broadcasted_iota(jnp.int32, (tt, OUT_LANES), 1)
        acc = jnp.full((tt, OUT_LANES), MASKED_KEY, jnp.int32)
        work = center
        for p in range(spec.PEAKS_PER_FRAME_CAP):
            best = jnp.max(work, axis=1, keepdims=True)  # [tt, 1]
            acc = jnp.where(out_lanes == p, best, acc)
            work = jnp.where(work == best, jnp.int32(NEG), work)
        out_ref[0] = acc

    return kernel, rows, blk


def fused_topkeys_batch(
    pcm: jnp.ndarray, interpret: bool = False, hopsplit: bool = True
) -> jnp.ndarray:
    """[B, S] 16 kHz PCM -> [B, n_tiles*TT, 128] packed per-frame top-P keys.

    Rows >= num_frames(S) come out MASKED (q <= 0) and are dropped by
    stage 2's validity check.  ``interpret=True`` runs the Pallas
    interpreter (CPU parity tests).  ``hopsplit=False`` selects the dense
    [1024, 1024] DFT formulation (kept for A/B measurement; the hop-block
    split is the production path — see _block_dft_basis).
    """
    bsz, s = pcm.shape
    t_total = spec.num_frames(s)
    assert t_total > 0, "clip shorter than one frame"
    n_tiles, tt = plan_tiles(t_total)
    kernel, rows, blk = _make_kernel(tt, t_total, hopsplit)

    # hop-blocked, halo-padded PCM: Y[:, j] = pcm hop block (j - HALO)
    nb = n_tiles * tt + blk - tt  # max DMA start (n_tiles-1)*tt + blk blocks
    pad_back = (nb - HALO) * spec.HOP - s
    y = jnp.pad(pcm, ((0, 0), (HALO * spec.HOP, pad_back))).reshape(
        bsz, nb, spec.HOP
    )

    basis = jnp.asarray(_block_dft_basis() if hopsplit else _dft_bases())
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles * tt, OUT_LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                basis.shape,
                lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tt, OUT_LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((blk, spec.HOP), jnp.float32),
            # frames scratch: only the dense formulation assembles frames
            pltpu.VMEM(
                (tt + 2 * HALO, 8 if hopsplit else spec.N_FFT), jnp.float32
            ),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(y, basis)

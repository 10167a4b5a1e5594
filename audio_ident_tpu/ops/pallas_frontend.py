"""Pallas fused kernel: salience -> local-max peaks -> per-frame top-P.

Everything after the DFT matmul in the fingerprint pipeline is elementwise
/ windowed VPU work over [T, 512] intermediates; unfused, XLA materializes
~6 of them in HBM per clip.  This kernel keeps one clip's spectrogram
VMEM-resident (T <= ~2k rows: every QUERY bucket; long INGEST buckets fall
back to the XLA path) and emits only the per-frame top-P packed selection
keys [T, 128] — an ~50x output compression.

Mosaic notes (this backend): int argmax, scatter (`.at[].set`), strided
lane slicing, value-level dynamic_slice and 3-D reshapes are all
unsupported — the kernel uses only static shifts, masked max extraction
(selection keys are unique per row, so max+mask == top-k), and lane-iota
where-selects.  The unrolled shifted reductions hold ~24 live [T, 512]
buffers, above the default 16 MB scoped-VMEM stack, so the limit is raised
via CompilerParams (v5e has 128 MB of VMEM).

Bit-parity contract with ops/fingerprint.select_peaks_jax stage 1:
identical box-mean/quantize/tie-key/local-max formulation and identical
top-P selection order; stage 2 (global budget selection) stays in XLA and
consumes the packed keys directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_ident_tpu import spec

NEG = -(2**31) + 1
MASKED_KEY = -(1 << 30)
OUT_LANES = 128  # VMEM lane alignment; lanes [0, P) carry the top keys


def _kernel(logmag_ref, out_ref):
    x = logmag_ref[...]  # [T, 512] f32
    tdim, fdim = x.shape
    t_r, f_r = spec.PEAK_TIME_RADIUS, spec.PEAK_FREQ_RADIUS

    # --- box mean: zero-padded shifted adds + true-count division ---------
    xp = jnp.pad(x, ((t_r, t_r), (0, 0)))
    st = xp[0:tdim]
    for k in range(1, 2 * t_r + 1):
        st = st + xp[k : k + tdim]
    sp = jnp.pad(st, ((0, 0), (f_r, f_r)))
    sf = sp[:, 0:fdim]
    for k in range(1, 2 * f_r + 1):
        sf = sf + sp[:, k : k + fdim]

    ti = jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 0)
    fi = jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 1)
    count_t = jnp.minimum(ti + t_r, tdim - 1) - jnp.maximum(ti - t_r, 0) + 1
    count_f = jnp.minimum(fi + f_r, fdim - 1) - jnp.maximum(fi - f_r, 0) + 1
    mean = sf / (count_t * count_f).astype(jnp.float32)

    # --- quantized salience + unique tie key -------------------------------
    q = jnp.floor((x - mean) * jnp.float32(spec.SALIENCE_QUANT)).astype(jnp.int32)
    key = q * 1024 + (ti % 32) * 32 + (fi % 32)

    # --- local max over the same window (shifted max, NEG padding) ---------
    kp = jnp.pad(key, ((t_r, t_r), (0, 0)), constant_values=NEG)
    mt = kp[0:tdim]
    for k in range(1, 2 * t_r + 1):
        mt = jnp.maximum(mt, kp[k : k + tdim])
    mp = jnp.pad(mt, ((0, 0), (f_r, f_r)), constant_values=NEG)
    mf = mp[:, 0:fdim]
    for k in range(1, 2 * f_r + 1):
        mf = jnp.maximum(mf, mp[:, k : k + fdim])
    is_peak = (
        (key == mf)
        & (fi >= spec.MIN_FREQ_BIN)
        & (fi <= spec.MAX_FREQ_BIN)
        & (q > 0)
    )
    key1 = jnp.where(is_peak, q * 1024 + (1023 - fi), jnp.int32(MASKED_KEY))

    # --- per-frame top-P by iterative masked max ----------------------------
    # Keys are unique per row, so extracting the max and masking the equal
    # cell is exact top-P; column p writes via lane-iota where-select.
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (tdim, OUT_LANES), 1)
    out = jnp.full((tdim, OUT_LANES), MASKED_KEY, jnp.int32)
    work = key1
    for p in range(spec.PEAKS_PER_FRAME_CAP):
        best = jnp.max(work, axis=1, keepdims=True)  # [T, 1]
        out = jnp.where(out_lanes == p, best, out)
        work = jnp.where(work == best, jnp.int32(NEG), work)
    out_ref[...] = out


def fused_topkeys(logmag: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[T, 512] log-magnitude -> [T, 128] packed top-P keys (lanes 0..P-1).

    ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    tdim, fdim = logmag.shape
    assert fdim == spec.N_BINS
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((tdim, OUT_LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(logmag)


# live buffers scale with T; cap so ~24 x [T, 512] f32 stays within VMEM
MAX_FUSED_FRAMES = 2048


def supports_fused(num_frames: int) -> bool:
    return 0 < num_frames <= MAX_FUSED_FRAMES

"""Micro-profile peak-selection internals + candidate DFT reformulations."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from audio_ident_tpu.utils.platform import setup_compile_cache

setup_compile_cache()

from audio_ident_tpu import spec
from audio_ident_tpu.ops import fingerprint as fp

BATCH = 2048
SAMPLES = 10 * spec.SAMPLE_RATE
BUDGET = spec.max_peaks(SAMPLES)
T = spec.num_frames(SAMPLES)


def timed(name, fn, *args, iters=4):
    r = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:8.1f} ms/batch")
    return dt


def main():
    rng = np.random.default_rng(0)
    # realistic quantized salience input for the peak stage
    q_np = rng.integers(-2000, 2000, size=(BATCH, T, spec.N_BINS), dtype=np.int32)
    q = jnp.asarray(q_np)
    lm = jnp.asarray(rng.standard_normal((BATCH, T, spec.N_BINS)).astype(np.float32))

    @jax.jit
    def localmax_only(qq):
        m = jax.vmap(fp._local_max_mask_jax)(qq)
        return jnp.sum(m.astype(jnp.int32))

    @jax.jit
    def stage1_only(qq):
        def one(qc):
            tdim, fdim = qc.shape
            mask = fp._local_max_mask_jax(qc)
            fi = jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 1)
            mask = mask & (fi >= spec.MIN_FREQ_BIN) & (fi <= spec.MAX_FREQ_BIN) & (qc > 0)
            qm = jnp.where(mask, qc, jnp.int32(spec.Q_INVALID))
            key1 = qm * 1024 + (1023 - fi)
            pooled = jax.lax.reduce_window(
                key1, jnp.int32(-(2**31) + 1), jax.lax.max,
                window_dimensions=(1, 8), window_strides=(1, 8), padding="VALID",
            )
            top1, _ = jax.lax.top_k(pooled, spec.PEAKS_PER_FRAME_CAP)
            return top1

        t1 = jax.vmap(one)(qq)
        return jnp.sum(t1)

    @jax.jit
    def full_peaks(qq):
        def one(qc):
            t, f, v = fp.select_peaks_jax(qc, BUDGET)
            return t + f + v.astype(jnp.int32)

        return jnp.sum(jax.vmap(one)(qq))

    @jax.jit
    def stage2_only(top1_batch):
        def one(t1):
            t, f, v = fp.select_from_topkeys(t1, BUDGET)
            return t + f + v.astype(jnp.int32)

        return jnp.sum(jax.vmap(one)(top1_batch))

    # precompute stage-1 output for isolating stage 2
    @jax.jit
    def mk_top1(qq):
        def one(qc):
            tdim, fdim = qc.shape
            mask = fp._local_max_mask_jax(qc)
            fi = jax.lax.broadcasted_iota(jnp.int32, (tdim, fdim), 1)
            mask = mask & (fi >= spec.MIN_FREQ_BIN) & (fi <= spec.MAX_FREQ_BIN) & (qc > 0)
            qm = jnp.where(mask, qc, jnp.int32(spec.Q_INVALID))
            key1 = qm * 1024 + (1023 - fi)
            pooled = jax.lax.reduce_window(
                key1, jnp.int32(-(2**31) + 1), jax.lax.max,
                window_dimensions=(1, 8), window_strides=(1, 8), padding="VALID",
            )
            top1, _ = jax.lax.top_k(pooled, spec.PEAKS_PER_FRAME_CAP)
            return top1

        return jax.vmap(one)(qq)

    top1 = jax.block_until_ready(mk_top1(q))

    timed("local-max mask only", localmax_only, q)
    timed("stage1 (localmax+pool+topk6)", stage1_only, q)
    timed("stage2 (flat top-budget+sort)", stage2_only, top1)
    timed("full select_peaks", full_peaks, q)

    # --- DFT variants -------------------------------------------------------
    frames = jnp.asarray(
        rng.standard_normal((BATCH * 64, spec.N_FFT)).astype(np.float32)
    )  # 1/~10 of real frame count to keep memory small; scale the readings

    @jax.jit
    def dense(fr):
        return jnp.sum(fp.log_magnitude_jax(fr))

    @jax.jit
    def folded_split(fr):
        # DIT radix-2 with twiddle folded into the odd basis: even half-DFT
        # [512, 514] + mirror, odd full [512, 1024].  0.75x MXU FLOPs.
        import functools

        n = spec.N_FFT
        half = n // 2
        nb = half // 2 + 1  # 257

        @functools.lru_cache(maxsize=1)
        def bases():
            i = np.arange(n, dtype=np.float64)
            win = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)
            # even: 512-point half-spectrum basis
            k = np.arange(nb, dtype=np.float64)
            m = np.arange(half, dtype=np.float64)
            ang = -2.0 * np.pi * np.outer(m, k) / half
            even = np.concatenate(
                [np.cos(ang) * win[0::2][:, None], np.sin(ang) * win[0::2][:, None]],
                axis=1,
            ).astype(np.float32)
            # odd: all 512 output bins with twiddle W^k folded in
            kk = np.arange(half, dtype=np.float64)
            ango = -2.0 * np.pi * np.outer(m, kk) / half  # odd 512-DFT, all bins
            o_re = np.cos(ango) * win[1::2][:, None]
            o_im = np.sin(ango) * win[1::2][:, None]
            tw = np.exp(-2j * np.pi * kk / n)
            # W^k * O[k]: re' = tw_re*o_re - tw_im*o_im; im' = tw_re*o_im + tw_im*o_re
            of_re = (tw.real[None, :] * o_re - tw.imag[None, :] * o_im).astype(np.float32)
            of_im = (tw.real[None, :] * o_im + tw.imag[None, :] * o_re).astype(np.float32)
            odd = np.concatenate([of_re, of_im], axis=1)
            return even, odd

        even_b, odd_b = bases()
        fe = fr[..., 0::2]
        fo = fr[..., 1::2]
        oe = jnp.dot(fe, jnp.asarray(even_b), precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        oo = jnp.dot(fo, jnp.asarray(odd_b), precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        e_re, e_im = oe[..., :nb], oe[..., nb:]
        # mirror even to 512 bins: E[k] = conj(E[512-k])
        e_re_f = jnp.concatenate([e_re, e_re[..., 1 : half - nb + 1][..., ::-1]], axis=-1)
        e_im_f = jnp.concatenate([e_im, -e_im[..., 1 : half - nb + 1][..., ::-1]], axis=-1)
        re = e_re_f + oo[..., :half]
        im = e_im_f + oo[..., half:]
        mag = jnp.sqrt(re * re + im * im)
        return jnp.sum(jnp.log(mag + jnp.float32(spec.LOG_FLOOR)))

    d0 = timed("dense DFT (131k frames)", dense, frames)
    d1 = timed("folded-split DFT (131k frames)", folded_split, frames)
    print(f"split/dense ratio: {d1 / d0:.3f}")


if __name__ == "__main__":
    main()

"""Content-dedup fingerprint: Haitsma-Kalker robust hash in JAX + golden.

Replaces the reference's Chromaprint/fpcalc subprocess (reference:
audio-ident-service/app/audio/dedup.py:74-125) with an in-process,
device-computable near-duplicate fingerprint.  Frozen format (spec.py
CFP_*): 16 kHz mono f32 -> |STFT|^2 (2048/1024) -> 33 log-spaced band
energies (300-2000 Hz) -> per frame, 32 bits
``b[t,k] = (E[t,k]-E[t,k+1]) - (E[t-1,k]-E[t-1,k+1]) > 0`` packed into one
uint32 per frame.  Similarity = fraction of equal bits over the common
prefix (reference semantics: bitwise similarity of 32-bit words,
dedup.py:127-168), candidates gated by the ±10 % duration window and the
0.85 threshold (dedup.py:170-222).

The NumPy and JAX paths share the exact same quantized decisions (sign
bits of float differences agree to measurement noise; ties at exactly 0.0
are broken identically by the strict > comparison on both paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_ident_tpu import spec


@functools.lru_cache(maxsize=1)
def _band_matrix() -> np.ndarray:
    """[N_FFT//2+1, CFP_BANDS] membership matrix for log-spaced bands."""
    n_bins = spec.CFP_N_FFT // 2 + 1
    freqs = np.fft.rfftfreq(spec.CFP_N_FFT, d=1.0 / spec.SAMPLE_RATE)
    edges = np.geomspace(spec.CFP_MIN_FREQ, spec.CFP_MAX_FREQ, spec.CFP_BANDS + 1)
    m = np.zeros((n_bins, spec.CFP_BANDS), dtype=np.float32)
    for b in range(spec.CFP_BANDS):
        sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
        if sel.any():
            m[sel, b] = 1.0
    return m


@functools.lru_cache(maxsize=1)
def _cfp_dft_basis() -> np.ndarray:
    """Windowed DFT basis [CFP_N_FFT, 2*(N_FFT//2+1)] (Hann)."""
    n = spec.CFP_N_FFT
    n_bins = n // 2 + 1
    i = np.arange(n, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)
    k = np.arange(n_bins, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(i, k) / n
    return np.concatenate(
        [np.cos(ang) * win[:, None], np.sin(ang) * win[:, None]], axis=1
    ).astype(np.float32)


def _num_frames(num_samples: int) -> int:
    if num_samples < spec.CFP_N_FFT:
        return 0
    return 1 + (num_samples - spec.CFP_N_FFT) // spec.CFP_HOP


def _band_energies_np(pcm: np.ndarray) -> np.ndarray:
    t = _num_frames(len(pcm))
    if t == 0:
        return np.zeros((0, spec.CFP_BANDS), np.float32)
    idx = np.arange(spec.CFP_N_FFT)[None, :] + spec.CFP_HOP * np.arange(t)[:, None]
    frames = pcm[idx].astype(np.float64)
    out = frames @ _cfp_dft_basis().astype(np.float64)
    n_bins = spec.CFP_N_FFT // 2 + 1
    power = out[:, :n_bins] ** 2 + out[:, n_bins:] ** 2
    return (power @ _band_matrix().astype(np.float64)).astype(np.float32)


def _bits_from_energies(e: np.ndarray) -> np.ndarray:
    """[T, BANDS] energies -> uint32 [T-1] packed sign-difference bits."""
    d = e[:, :-1] - e[:, 1:]  # band differences [T, 32]
    dd = d[1:] - d[:-1]  # temporal difference [T-1, 32]
    bits = (dd > 0).astype(np.uint32)
    weights = (1 << np.arange(spec.CFP_BANDS - 1, dtype=np.uint32)).astype(np.uint32)
    return (bits * weights[None, :]).sum(axis=1).astype(np.uint32)


def content_fingerprint_np(pcm_16k: np.ndarray) -> np.ndarray:
    """NumPy golden: 16 kHz mono f32 -> uint32 fingerprint words."""
    e = _band_energies_np(np.asarray(pcm_16k, np.float32))
    if len(e) < 2:
        return np.zeros(0, np.uint32)
    return _bits_from_energies(e)


def content_fingerprint_jax(pcm_16k: jnp.ndarray) -> jnp.ndarray:
    """Device path: same function, static shape from static input length."""
    t = _num_frames(pcm_16k.shape[0])
    if t < 2:
        return jnp.zeros(0, jnp.uint32)
    # hop-block framing (HOP divides N_FFT: ratio 2) — slices, no gather
    need = (t - 1) + spec.CFP_N_FFT // spec.CFP_HOP
    x = pcm_16k[: need * spec.CFP_HOP].reshape(need, spec.CFP_HOP)
    frames = jnp.concatenate([x[:t], x[1 : t + 1]], axis=1)
    out = jnp.dot(
        frames,
        jnp.asarray(_cfp_dft_basis()),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    n_bins = spec.CFP_N_FFT // 2 + 1
    power = out[:, :n_bins] ** 2 + out[:, n_bins:] ** 2
    e = jnp.dot(
        power, jnp.asarray(_band_matrix()), precision=jax.lax.Precision.HIGHEST
    )
    d = e[:, :-1] - e[:, 1:]
    dd = d[1:] - d[:-1]
    bits = (dd > 0).astype(jnp.uint32)
    weights = (1 << jnp.arange(spec.CFP_BANDS - 1, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, :], axis=1).astype(jnp.uint32)


def fingerprint_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """Bitwise similarity over the common prefix (reference semantics:
    dedup.py:127-168 — fraction of equal bits across compared words)."""
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    x = np.bitwise_xor(a[:n], b[:n])
    diff_bits = np.unpackbits(x.view(np.uint8)).sum()
    total = n * 32
    return 1.0 - float(diff_bits) / total


def encode_fingerprint(fp: np.ndarray) -> str:
    """uint32 words -> hex string for the catalog column."""
    return fp.astype("<u4").tobytes().hex()


def decode_fingerprint(s: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(s), dtype="<u4").astype(np.uint32)


def is_content_duplicate(
    query_fp: np.ndarray,
    query_duration: float,
    candidates: list[tuple[str, str, float]],
) -> tuple[str, float] | None:
    """(track_id, similarity) of the best duplicate above threshold, or None.

    ``candidates``: (track_id, fingerprint_hex, duration) rows already
    filtered by the caller to the ±10 % duration window (reference:
    dedup.py:170-222).
    """
    best: tuple[str, float] | None = None
    for track_id, fp_hex, dur in candidates:
        if abs(dur - query_duration) > spec.CFP_DURATION_TOLERANCE * max(
            query_duration, 1e-9
        ):
            continue
        sim = fingerprint_similarity(query_fp, decode_fingerprint(fp_hex))
        if sim >= spec.CFP_SIMILARITY_THRESHOLD and (
            best is None or sim > best[1]
        ):
            best = (track_id, sim)
    return best

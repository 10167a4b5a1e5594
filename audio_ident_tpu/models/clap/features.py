"""CLAP log-mel features in JAX (dB power mel spectrogram, 48 kHz).

Numerically mirrors ``transformers.ClapFeatureExtractor`` (hann 1024 / hop
480 / power 2 / 64 mel / dB), whose host-side constants (window + mel
filter bank) are fetched from the public ``transformers.audio_utils``
helpers once and baked into the program; the spectrogram itself runs on
the MXU as a strided DFT convolution instead of a host STFT loop.

Reference behavior being replaced: the torch processor call inside
``generate_embedding`` (reference: app/audio/embedding.py:81-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 48_000
N_FFT = 1024
HOP = 480
N_FREQ = N_FFT // 2 + 1  # 513
N_MEL = 64
CHUNK_SAMPLES = 10 * SAMPLE_RATE  # 480,000 -> 1001 frames


@functools.lru_cache(maxsize=4)
def _constants(slaney: bool = False, n_mel: int = N_MEL) -> tuple[np.ndarray, np.ndarray]:
    """(dft_basis [N_FFT, 2*N_FREQ], mel_filters [N_FREQ, n_mel])."""
    from transformers.audio_utils import mel_filter_bank, window_function

    win = window_function(N_FFT, "hann").astype(np.float64)
    i = np.arange(N_FFT, dtype=np.float64)
    k = np.arange(N_FREQ, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(i, k) / N_FFT
    basis = np.concatenate(
        [np.cos(ang) * win[:, None], np.sin(ang) * win[:, None]], axis=1
    ).astype(np.float32)

    if slaney:
        mel = mel_filter_bank(
            num_frequency_bins=N_FREQ,
            num_mel_filters=n_mel,
            min_frequency=0,
            max_frequency=14_000,
            sampling_rate=SAMPLE_RATE,
            norm="slaney",
            mel_scale="slaney",
        )
    else:
        mel = mel_filter_bank(
            num_frequency_bins=N_FREQ,
            num_mel_filters=n_mel,
            min_frequency=0,
            max_frequency=14_000,
            sampling_rate=SAMPLE_RATE,
            norm=None,
            mel_scale="htk",
        )
    return basis, mel.astype(np.float32)


def log_mel_features(
    pcm_48k: jnp.ndarray, slaney: bool = True, n_mel: int = N_MEL
) -> jnp.ndarray:
    """[B, S] mono 48 kHz f32 -> [B, T, n_mel] log-mel dB (T = S//HOP + 1).

    ``slaney=True`` matches non-fusion CLAP checkpoints (rand_trunc path of
    the HF extractor); ``slaney=False`` the fusion ones.
    """
    basis, mel = _constants(slaney, n_mel)
    pad = N_FFT // 2
    x = jnp.pad(pcm_48k, ((0, 0), (pad, pad)), mode="reflect")
    b, s = x.shape
    t = (s - N_FFT) // HOP + 1

    # Framing by hop-block slicing (no gather, no strided conv — a strided
    # conv with hop 480 lowers off the MXU and was measured 1000x slower):
    # pad to a whole number of hop blocks, reshape to [B, blocks, HOP], and
    # build each frame from 3 consecutive blocks sliced to N_FFT.
    n_blocks = t - 1 + (N_FFT + HOP - 1) // HOP  # blocks needed
    x = jnp.pad(x, ((0, 0), (0, n_blocks * HOP - s)))[:, : n_blocks * HOP]
    y = x.reshape(b, n_blocks, HOP)
    ratio = (N_FFT + HOP - 1) // HOP  # 3 blocks cover one frame
    parts = [y[:, i : i + t] for i in range(ratio)]
    frames = jnp.concatenate(parts, axis=2)[:, :, :N_FFT]  # [B, T, N_FFT]

    out = jnp.dot(
        frames,
        jnp.asarray(basis),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    re = out[..., :N_FREQ]
    im = out[..., N_FREQ:]
    power = re * re + im * im
    mel_spec = jnp.dot(
        power, jnp.asarray(mel), precision=jax.lax.Precision.HIGHEST
    )
    # power_to_db with no top_db clamp (HF log_mel="dB", db_range=None)
    return 10.0 * jnp.log10(jnp.maximum(mel_spec, 1e-10))

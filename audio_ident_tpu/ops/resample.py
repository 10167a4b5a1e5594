"""On-device 48 kHz -> 16 kHz resampling (polyphase FIR decimate-by-3).

TPU-first replacement for the reference's second ffmpeg subprocess: the
reference decodes every file TWICE (16 kHz + 48 kHz, reference:
audio-ident-service/app/audio/decode.py:74-87); here the host decodes once
at 48 kHz and the 16 kHz fingerprint stream is derived on device.

Filter: 91-tap linear-phase Kaiser lowpass (cutoff 7.2 kHz at 48 kHz), so
the kernel is symmetric and XLA's correlation == NumPy's convolution.

Alignment contract (frozen): y[n] = conv_full(x, h)[DELAY + 3n] for
n in [0, len(x)//3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_TAPS = 91
DELAY = (NUM_TAPS - 1) // 2
DECIM = 3


@functools.lru_cache(maxsize=1)
def resample_kernel() -> np.ndarray:
    """Deterministic FIR lowpass coefficients (float32, symmetric)."""
    from scipy.signal import firwin

    h = firwin(NUM_TAPS, 7200.0 / 24000.0, window=("kaiser", 9.0))
    return h.astype(np.float32)


def resample_48k_to_16k_np(x_48k: np.ndarray) -> np.ndarray:
    """NumPy golden resampler (same contract as the device op)."""
    x = np.asarray(x_48k, dtype=np.float32)
    out_len = len(x) // DECIM
    if out_len == 0:
        return np.zeros(0, dtype=np.float32)
    full = np.convolve(x, resample_kernel(), mode="full")
    return full[DELAY : DELAY + DECIM * out_len : DECIM].astype(np.float32)


@jax.jit
def resample_48k_to_16k(x_48k: jnp.ndarray) -> jnp.ndarray:
    """Device resampler: [S] float32 at 48 kHz -> [S//3] float32 at 16 kHz."""
    s = x_48k.shape[0]
    out_len = s // DECIM
    h = jnp.asarray(resample_kernel())  # symmetric: correlation == convolution
    out = jax.lax.conv_general_dilated(
        x_48k[None, None, :],
        h[None, None, :],
        window_strides=(DECIM,),
        padding=[(DELAY, DELAY)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0, :out_len]

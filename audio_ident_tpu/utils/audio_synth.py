"""Deterministic synthetic audio + WAV encoding (tests, eval corpus, benches).

Lives in the package (not tests/conftest) because scripts import it too —
importing tests/conftest pins JAX to the CPU test backend, which silently
invalidated early on-chip benchmark numbers.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def synth_audio(rng, seconds: float, sr: int = 16000) -> np.ndarray:
    """Deterministic 'musical' audio: sum of decaying tone bursts."""
    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = np.zeros(n, dtype=np.float32)
    n_notes = max(int(seconds * 6), 4)
    freqs = rng.uniform(80.0, 5000.0, size=n_notes).astype(np.float32)
    starts = rng.uniform(0.0, max(seconds - 0.3, 0.05), size=n_notes).astype(np.float32)
    durs = rng.uniform(0.2, 1.2, size=n_notes).astype(np.float32)
    amps = rng.uniform(0.1, 0.6, size=n_notes).astype(np.float32)
    for f0, s0, d0, a0 in zip(freqs, starts, durs, amps):
        seg = (t >= s0) & (t < s0 + d0)
        tt = t[seg] - s0
        x[seg] += a0 * np.exp(-3.0 * tt) * np.sin(2 * np.pi * f0 * tt).astype(np.float32)
        x[seg] += 0.4 * a0 * np.exp(-4.0 * tt) * np.sin(2 * np.pi * 2 * f0 * tt).astype(
            np.float32
        )
    x += 0.002 * rng.standard_normal(n).astype(np.float32)
    peak = np.max(np.abs(x)) or 1.0
    return (0.7 * x / peak).astype(np.float32)


def wav_bytes(pcm: np.ndarray, sr: int = 16000) -> bytes:
    """Encode mono float32 PCM as 16-bit WAV (stdlib)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        ints = np.round(np.clip(pcm * 32767.0, -32768, 32767)).astype("<i2")
        w.writeframes(ints.tobytes())
    return buf.getvalue()

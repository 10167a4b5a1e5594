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


def synth_track(rng, seconds: float | None = None, sr: int = 16000) -> np.ndarray:
    """A DIVERSE synthetic track: random style (tempo, scale, timbre,
    percussion, dynamics), for eval libraries where degradation curves
    must be measured over varied material, not one texture (VERDICT r1:
    "synthetic is fine if diverse: varied tempi/timbres/durations").

    Styles vary: tempo 60-180 BPM, note density, pentatonic/diatonic
    scale over a random tonic, per-track instrument timbre (harmonic
    amplitude rolloff, inharmonicity, attack/decay), optional percussion
    layer, section-level dynamics.
    """
    if seconds is None:
        seconds = float(rng.uniform(20.0, 120.0))
    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = np.zeros(n, dtype=np.float32)

    tempo = float(rng.uniform(60.0, 180.0))
    beat = 60.0 / tempo
    tonic = float(rng.uniform(110.0, 440.0))
    scales = (
        np.array([0, 2, 4, 7, 9]),          # pentatonic major
        np.array([0, 2, 4, 5, 7, 9, 11]),   # diatonic major
        np.array([0, 3, 5, 7, 10]),         # minor pentatonic
    )
    scale = scales[int(rng.integers(len(scales)))]
    # instrument: harmonic rolloff + inharmonicity + envelope shape
    n_harm = int(rng.integers(3, 9))
    rolloff = float(rng.uniform(0.9, 2.5))
    harm_amps = (1.0 / np.arange(1, n_harm + 1) ** rolloff).astype(np.float32)
    inharm = float(rng.uniform(0.0, 0.002))
    attack = float(rng.uniform(0.003, 0.08))
    decay = float(rng.uniform(1.0, 6.0))
    density = float(rng.uniform(0.5, 2.0))  # notes per beat

    n_notes = max(int(seconds / beat * density), 8)
    grid = rng.integers(0, max(int(seconds / (beat / 2)), 1), size=n_notes)
    starts = grid.astype(np.float32) * (beat / 2)
    degrees = rng.integers(0, len(scale), size=n_notes)
    octaves = rng.integers(0, 3, size=n_notes)
    amps = rng.uniform(0.15, 0.7, size=n_notes).astype(np.float32)
    durs = rng.uniform(0.5, 2.0, size=n_notes).astype(np.float32) * beat
    # section dynamics: 4 sections with different loudness
    sec_gain = rng.uniform(0.4, 1.0, size=4).astype(np.float32)

    for s0, deg, octv, a0, d0 in zip(starts, degrees, octaves, amps, durs):
        if s0 >= seconds - 0.05:
            continue
        f0 = tonic * 2.0 ** (octv + scale[deg] / 12.0)
        if f0 * n_harm >= sr / 2:
            f0 = min(f0, (sr / 2 - 100) / n_harm)
        i0 = int(s0 * sr)
        i1 = min(int((s0 + d0) * sr), n)
        tt = t[i0:i1] - s0
        env = (1.0 - np.exp(-tt / attack)) * np.exp(-decay * tt)
        gain = a0 * sec_gain[min(int(s0 / seconds * 4), 3)]
        h = np.arange(1, n_harm + 1, dtype=np.float32)
        fh = f0 * h * (1.0 + inharm * h * h)  # [H]
        note = np.sin(2 * np.pi * tt[:, None] * fh[None, :]) @ harm_amps
        x[i0:i1] += gain * env * note

    if rng.random() < 0.7:  # percussion layer
        n_hits = int(seconds / beat)
        for b in range(n_hits):
            s0 = b * beat + float(rng.uniform(-0.01, 0.01))
            if s0 < 0 or s0 >= seconds - 0.05:
                continue
            i0 = int(s0 * sr)
            i1 = min(i0 + int(0.08 * sr), n)
            tt = t[i0:i1] - s0
            burst = rng.standard_normal(i1 - i0).astype(np.float32)
            x[i0:i1] += 0.25 * np.exp(-40.0 * tt) * burst

    x += 0.001 * rng.standard_normal(n).astype(np.float32)
    peak = float(np.max(np.abs(x))) or 1.0
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

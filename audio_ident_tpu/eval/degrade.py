"""Signal degradations for the eval corpus: calibrated noise, capture sims.

Mirrors the reference corpus builder's degradation classes (reference:
scripts/build_eval_corpus.py:153-188 — anoisesrc white/pink at target SNR
amix'd over the clip; :46-639 — mic and browser captures) with native
implementations, so accuracy-vs-SNR curves are measurable in any image.
All functions are deterministic given the ``rng``.
"""

from __future__ import annotations

import numpy as np

from audio_ident_tpu.eval.codecs import codec_sim

# ---------------------------------------------------------------------------
# Noise generators
# ---------------------------------------------------------------------------


def make_noise(kind: str, n: int, rng: np.random.Generator, sr: int = 16000) -> np.ndarray:
    """Unit-power noise of a given color/texture.

    - ``white``: flat spectrum;
    - ``pink``: 1/f spectral shaping (crowd/room ambience proxy);
    - ``babble``: sum of amplitude-modulated speech-band noise bursts
      (cafe/crowd proxy — the reference's hardest environment).
    """
    if kind == "white":
        x = rng.standard_normal(n).astype(np.float32)
    elif kind == "pink":
        spec = np.fft.rfft(rng.standard_normal(n))
        f = np.arange(len(spec), dtype=np.float64)
        f[0] = 1.0
        x = np.fft.irfft(spec / np.sqrt(f), n).astype(np.float32)
    elif kind == "babble":
        # 8 modulated voices in 150-4000 Hz
        x = np.zeros(n, np.float32)
        t = np.arange(n) / sr
        for _ in range(8):
            spec = np.fft.rfft(rng.standard_normal(n))
            freqs = np.fft.rfftfreq(n, 1.0 / sr)
            band = (freqs > 150.0) & (freqs < 4000.0)
            voice = np.fft.irfft(np.where(band, spec, 0.0), n)
            rate = rng.uniform(2.0, 6.0)  # syllabic rate
            env = 0.5 * (1.0 + np.sin(2 * np.pi * rate * t + rng.uniform(0, 6.28)))
            x += (voice * env).astype(np.float32)
    else:
        raise ValueError(f"unknown noise kind {kind!r}")
    power = float(np.mean(x**2)) or 1e-12
    return x / np.sqrt(power)


def add_noise_snr(
    x: np.ndarray,
    snr_db: float,
    rng: np.random.Generator,
    kind: str = "white",
    sr: int = 16000,
) -> np.ndarray:
    """Mix noise at an exact SNR, then peak-normalize only if clipping."""
    sig_pow = float(np.mean(x**2)) or 1e-12
    noise = make_noise(kind, len(x), rng, sr) * np.sqrt(sig_pow / 10 ** (snr_db / 10))
    out = x + noise
    peak = float(np.max(np.abs(out)))
    if peak > 1.0:
        out = out / peak
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Capture-path simulations
# ---------------------------------------------------------------------------


def _small_room_ir(rng: np.random.Generator, sr: int, rt60: float = 0.3) -> np.ndarray:
    """Exponentially-decaying noise impulse response (image-method proxy)."""
    n = int(rt60 * sr)
    t = np.arange(n) / sr
    ir = rng.standard_normal(n).astype(np.float32) * np.exp(-6.9 * t / rt60)
    ir[0] = 1.0  # direct path
    return ir / float(np.sqrt(np.sum(ir**2)))


def mic_capture_chain(
    x: np.ndarray, rng: np.random.Generator, sr: int = 16000, snr_db: float = 15.0
) -> np.ndarray:
    """Speaker->room->phone-mic: reverb, band-limit, ambience, clipping.

    The reference's reality check expects this environment to HURT
    (40-60% top-1 — reference:
    docs/research/01-initial-research/09-reality-check.md:173).
    """
    y = np.convolve(x, _small_room_ir(rng, sr), mode="full")[: len(x)]
    # phone mic band-pass ~100 Hz - 7 kHz via FFT mask
    spec = np.fft.rfft(y)
    freqs = np.fft.rfftfreq(len(y), 1.0 / sr)
    mask = 1.0 / (1.0 + (100.0 / np.maximum(freqs, 1.0)) ** 4)  # HP @100
    mask *= 1.0 / (1.0 + (freqs / 7000.0) ** 8)  # LP @7k
    y = np.fft.irfft(spec * mask, len(y)).astype(np.float32)
    y = add_noise_snr(y, snr_db, rng, kind="pink", sr=sr)
    y = np.tanh(1.5 * y) / 1.5  # mild mic compression/soft clip
    return y.astype(np.float32)


def browser_capture_chain(
    x: np.ndarray, rng: np.random.Generator, sr: int = 16000
) -> np.ndarray:
    """MediaRecorder-ish path: AGC gain, 16-bit quantization, Opus-class
    lossy coding (real ffmpeg upstream when present; callers choosing the
    real-codec path use eval.codecs.roundtrip — this sim-only chain is
    deliberately codec_sim so it behaves identically on every host)."""
    gain = rng.uniform(0.5, 0.9)
    y = np.round(gain * x * 32767.0) / 32767.0
    y = codec_sim(y.astype(np.float32), sr, bitrate_kbps=32)
    return y.astype(np.float32)


def browser_capture(
    x: np.ndarray, rng: np.random.Generator, sr: int = 16000
) -> tuple[np.ndarray, str]:
    """Browser capture with provenance: AGC gain + 16-bit quantization +
    REAL Opus 32k when a codec engine is reachable (label ``browser``),
    else the MDCT sim (label ``browser-sim``).  The corpus builder uses
    this; :func:`browser_capture_chain` stays sim-only for deterministic
    unit tests."""
    from audio_ident_tpu.eval.codecs import roundtrip

    gain = rng.uniform(0.5, 0.9)
    y = np.round(gain * x * 32767.0) / 32767.0
    out, label = roundtrip(y.astype(np.float32), sr, "opus", 32)
    return out.astype(np.float32), (
        "browser-sim" if "-sim" in label else "browser"
    )

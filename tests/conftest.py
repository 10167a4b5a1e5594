"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the reference
offers no distributed-test pattern — SURVEY.md §4 — so this is ours).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and OVERRIDES the
# JAX_PLATFORMS env var via jax.config — re-pin it so tests really run on
# the virtual 8-device CPU mesh (not silently on the single real chip).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU sort codegen is slow (~8 s per sort
# op); caching makes every test run after the first fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def synth_audio(rng, seconds: float, sr: int = 16000) -> np.ndarray:
    """Synthesize deterministic 'musical' audio: sum of decaying tone bursts."""
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
        # add a harmonic for spectral richness
        x[seg] += 0.4 * a0 * np.exp(-4.0 * tt) * np.sin(2 * np.pi * 2 * f0 * tt).astype(
            np.float32
        )
    x += 0.002 * rng.standard_normal(n).astype(np.float32)
    peak = np.max(np.abs(x)) or 1.0
    return (0.7 * x / peak).astype(np.float32)


@pytest.fixture()
def make_audio(rng):
    def _make(seconds: float, sr: int = 16000, seed: int | None = None):
        r = np.random.default_rng(seed) if seed is not None else rng
        return synth_audio(r, seconds, sr)

    return _make


@pytest.fixture
def anyio_backend():
    """Async endpoint tests run on asyncio via the anyio pytest plugin."""
    return "asyncio"


def wav_bytes(pcm: np.ndarray, sr: int = 16000) -> bytes:
    """Encode mono float32 PCM as 16-bit WAV (stdlib, like the reference's
    in-memory WAV synthesis for decode tests — SURVEY.md §4 technique 4)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        ints = np.round(np.clip(pcm * 32767.0, -32768, 32767)).astype("<i2")
        w.writeframes(ints.tobytes())
    return buf.getvalue()

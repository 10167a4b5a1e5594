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


from audio_ident_tpu.utils.audio_synth import (  # noqa: E402, F401 — re-exported to tests
    synth_audio,
    wav_bytes,
)


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

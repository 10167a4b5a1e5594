"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the reference
offers no distributed-test pattern — SURVEY.md §4 — so this is ours).
Must run before jax is imported anywhere.
"""

import os

# HARD-set, not setdefault: this image's session env carries
# JAX_PLATFORMS=axon (the remote-TPU plugin).  With setdefault the env
# keeps "axon", and every in-test call of honor_jax_platforms_env()
# (service CLI, eval-script mains) re-pins jax onto the REMOTE TPU
# backend — tests then compile through the remote tunnel, which is
# minutes-slow under load and hangs outright when the pool is
# overloaded (observed: one CLI test at 259 s vs 5 s local, and full
# suite stalls).  Tests must be hermetic: virtual CPU mesh only.
os.environ["JAX_PLATFORMS"] = "cpu"
# Background re-warm compiles segfault XLA:CPU when racing foreground
# compiles (jaxlib bug; see state._no_bg_rewarm).  Tests call
# _rewarm_if_grown() synchronously where the behavior matters.
os.environ.setdefault("AUDIO_IDENT_NO_BG_REWARM", "1")
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
# host-tagged: XLA:CPU AOT blobs are CPU-feature-specific; loading a cache
# from a different machine segfaults (see utils/platform.host_cache_tag)
from audio_ident_tpu.utils.platform import host_cache_tag  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", f"/root/repo/.jax_cache/{host_cache_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# XLA:CPU executable serialization (persistent-cache writes) segfaults
# when another thread is compiling concurrently (observed twice at the
# same suite position: a background _rewarm_if_grown writing its cache
# entry while the foreground test compiled a mesh program; never
# reproducible in isolation).  Tests run many engines whose executors
# compile in parallel, so serialize ALL compiles under one lock.  The
# production TPU path compiles through the remote compiler and never
# hits XLA:CPU serialization, so this stays test-only.
import threading  # noqa: E402

from jax._src import compiler as _jax_compiler  # noqa: E402

_compile_lock = threading.RLock()
_orig_compile_or_get_cached = _jax_compiler.compile_or_get_cached


def _serial_compile_or_get_cached(*args, **kwargs):
    with _compile_lock:
        return _orig_compile_or_get_cached(*args, **kwargs)


_jax_compiler.compile_or_get_cached = _serial_compile_or_get_cached

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


@pytest.fixture(autouse=True)
def _drain_engines(monkeypatch):
    """Close every EngineState created in a test at teardown.

    The httpx ASGITransport client never runs app lifespan, so app
    _shutdown (and engine.close) never fires in tests; engines then leak
    their executor threads, whose background re-warm compiles keep
    running during LATER tests — and XLA:CPU's persistent-cache
    serialize segfaulted the whole suite from exactly such a zombie
    thread.  Track instances, drain their executors synchronously.
    """
    from audio_ident_tpu.service.state import EngineState

    created = []
    orig_init = EngineState.__init__

    def tracking_init(self, *args, **kwargs):
        orig_init(self, *args, **kwargs)
        created.append(self)

    monkeypatch.setattr(EngineState, "__init__", tracking_init)
    yield
    for engine in created:
        engine._closed = True
        engine._tpu.shutdown(wait=True, cancel_futures=True)

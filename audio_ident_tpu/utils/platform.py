"""JAX platform pinning for entry points.

The TPU platform plugin in this image force-registers itself and
OVERRIDES the ``JAX_PLATFORMS`` env var via ``jax.config`` at import
time.  Every entry point that must respect the user's choice (the test
suite's virtual CPU mesh, CPU eval runs while the chip is busy) calls
:func:`honor_jax_platforms_env` right after importing jax — the same
re-pin tests/conftest.py and service/__main__.py perform.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    if "JAX_PLATFORMS" in os.environ:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def host_cache_tag() -> str:
    """Short hash of this host's CPU feature flags.

    XLA:CPU serializes AOT executables specialized to the compile host's
    CPU features; loading them on a machine with different features is
    undefined behavior ("could lead to execution errors such as SIGILL" —
    and did: a cache carried over from a previous round's AVX512+AMX host
    segfaulted the test suite on this one).  Cache paths embed this tag so
    a host change starts a fresh cache instead of loading foreign code.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform as _platform

    return hashlib.sha256(_platform.processor().encode()).hexdigest()[:10]


def setup_compile_cache(path: str | None = None) -> None:
    """Point JAX at the machine-global persistent compilation cache.

    Compiles through this image's remote TPU compiler are minutes-slow;
    every standalone entry point (eval scripts, benches) must set the
    cache or first runs dominate wall-clock.  ``COMPILE_CACHE`` env
    overrides the base dir; the host tag (see :func:`host_cache_tag`)
    is always appended.
    """
    import jax

    cache = path or os.environ.get(
        "COMPILE_CACHE", "~/.cache/audio-ident-tpu/xla"
    )
    cache = os.path.join(os.path.expanduser(cache), host_cache_tag())
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

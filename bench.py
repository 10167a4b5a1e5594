"""Headline benchmark: 10 s clips fingerprinted per second per chip.

North star (BASELINE.json): >= 10,000 x 10 s clips fingerprinted /sec /chip
with hash parity vs the CPU reference.  Prints ONE JSON line.

Run on the real TPU (no JAX_PLATFORMS=cpu).  Timing gotcha: through the
axon tunnel ``block_until_ready`` can return early, so every timed
iteration ends with a device->host scalar readback.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # machine-global compile cache: repeat bench runs skip the multi-minute
    # cold compile of the batch-2048 pipeline
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path("~/.cache/audio-ident-tpu/xla").expanduser()),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from audio_ident_tpu import spec
    from audio_ident_tpu.ops.fingerprint import fingerprint_jax

    seconds = 10
    samples = seconds * spec.SAMPLE_RATE
    budget = spec.max_peaks(samples)
    batch = 2048  # large batch amortizes the ~26 ms tunnel dispatch overhead

    @jax.jit
    def step(pcm):
        h, t, v = jax.vmap(lambda x: fingerprint_jax(x, budget))(pcm)
        # fold to one scalar so the timed readback can't be elided
        return jnp.sum(v.astype(jnp.int32)) + jnp.sum(h.astype(jnp.uint32) & 1)

    rng = np.random.default_rng(0)
    clips = [
        jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32))
        for _ in range(2)
    ]

    int(step(clips[0]))  # compile + warm
    int(step(clips[1]))

    iters = 8
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += int(step(clips[i % 2]))  # scalar readback forces sync
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    baseline = 10_000.0  # north-star clips/sec/chip
    print(
        json.dumps(
            {
                "metric": "fingerprint_clips_per_sec_10s",
                "value": round(clips_per_sec, 1),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

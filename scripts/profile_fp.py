"""Stage-level profiling of the fingerprint pipeline on the real chip.

Times each pipeline prefix at the bench batch size so we know where the
233 ms of compute at B=2048 actually goes, plus a pipelined-dispatch
variant (launch all iterations, sync once) to measure how much of the
26 ms/call tunnel overhead per-iteration syncs add.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from audio_ident_tpu.utils.platform import setup_compile_cache

setup_compile_cache()

from audio_ident_tpu import spec
from audio_ident_tpu.ops import fingerprint as fp

BATCH = 2048
SECONDS = 10
SAMPLES = SECONDS * spec.SAMPLE_RATE
BUDGET = spec.max_peaks(SAMPLES)


def timed(name, fn, x, iters=4):
    r = fn(x)
    jax.block_until_ready(r)
    # force a real readback sync (tunnel block_until_ready can return early)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.1f} ms/batch  {BATCH / dt:9.1f} clips/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((BATCH, SAMPLES)).astype(np.float32))

    @jax.jit
    def stage_frames(x):
        f = jax.vmap(fp.frame_signal_jax)(x)
        return jnp.sum(f[..., 0])

    @jax.jit
    def stage_logmag(x):
        lm = jax.vmap(lambda c: fp.log_magnitude_jax(fp.frame_signal_jax(c)))(x)
        return jnp.sum(lm[..., 0])

    @jax.jit
    def stage_salience(x):
        def one(c):
            lm = fp.log_magnitude_jax(fp.frame_signal_jax(c))
            return fp.quantized_salience_jax(lm)

        q = jax.vmap(one)(x)
        return jnp.sum(q[..., 0])

    @jax.jit
    def stage_peaks(x):
        def one(c):
            lm = fp.log_magnitude_jax(fp.frame_signal_jax(c))
            q = fp.quantized_salience_jax(lm)
            t, f, v = fp.select_peaks_jax(q, BUDGET)
            return t + f + v.astype(jnp.int32)

        s = jax.vmap(one)(x)
        return jnp.sum(s)

    @jax.jit
    def full(x):
        h, t, v = jax.vmap(lambda c: fp.fingerprint_jax(c, BUDGET))(x)
        return jnp.sum(v.astype(jnp.int32)) + jnp.sum(h.astype(jnp.uint32) & 1)

    timed("frames only", stage_frames, pcm)
    timed("frames+logmag (dense DFT)", stage_logmag, pcm)
    timed("+quantized salience", stage_salience, pcm)
    timed("+peak selection", stage_peaks, pcm)
    t_full = timed("full pipeline (sync each iter)", full, pcm)

    # pipelined dispatch: launch N batches back to back, sync once at the end
    pcm2 = jnp.asarray(rng.standard_normal((BATCH, SAMPLES)).astype(np.float32))
    iters = 8
    accs = [full(pcm), full(pcm2)]
    _ = [np.asarray(a) for a in accs]  # warm + sync
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(full(pcm if i % 2 == 0 else pcm2))
    _ = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / iters
    print(f"{'full pipeline (pipelined)':34s} {dt * 1e3:8.1f} ms/batch  {BATCH / dt:9.1f} clips/s")
    print(f"sync-per-iter overhead: {(t_full - dt) * 1e3:.1f} ms/batch")


if __name__ == "__main__":
    main()

"""Profile the fingerprint pipeline's stage-2 cost on the chip (r5 stretch).

Times, at the bench shape (B=2048, 10 s clips):
  A. fused Pallas front-end alone (packed top-keys out)
  B. full pipeline (front-end + stage-2 selection + pair hashing)
  C. stage-2 selection alone from precomputed keys
  D. pair hashing alone from precomputed (t, f, valid)
plus candidate variants of stage 2.  Pure measurement harness — no
persisted-format or parity-contract changes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu import spec
from audio_ident_tpu.ops.fingerprint import (
    fingerprint_batch,
    pair_hashes_jax,
    select_from_topkeys,
)
from audio_ident_tpu.ops.fused_frontend import fused_topkeys_batch
from audio_ident_tpu.utils.platform import setup_compile_cache


def timeit(fn, *args, iters=8, warm=2):
    # through the axon tunnel block_until_ready can return early; force a
    # host readback of every output (bench.py methodology)
    for _ in range(warm):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt


def main() -> None:
    setup_compile_cache()
    seconds = 10
    samples = seconds * spec.SAMPLE_RATE
    budget = spec.max_peaks(samples)
    batch = 2048
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32))

    @jax.jit
    def front_keys(p):
        return fused_topkeys_batch(p)

    @jax.jit
    def front(p):
        k = fused_topkeys_batch(p)
        return jnp.sum(k & 1)  # scalar fold: tunnel readback must stay tiny

    @jax.jit
    def full(p):
        h, t, v = fingerprint_batch(p, budget, use_pallas=True)
        return jnp.sum(v.astype(jnp.int32)) + jnp.sum(h & 1)

    keys = jax.block_until_ready(front_keys(pcm))

    @jax.jit
    def stage2(k):
        def one(kk):
            t, f, valid = select_from_topkeys(
                kk[:, : spec.PEAKS_PER_FRAME_CAP], budget
            )
            return t, f, valid
        return jax.vmap(one)(k)

    t_sel, f_sel, v_sel = jax.block_until_ready(stage2(keys))

    @jax.jit
    def pairs(t, f, v):
        h, ta, keep = jax.vmap(pair_hashes_jax)(t, f, v)
        return jnp.sum(keep.astype(jnp.int32)) + jnp.sum(h & 1)

    @jax.jit
    def stage2_sum(k):
        t, f, v = stage2(k)
        return jnp.sum(v.astype(jnp.int32)) + jnp.sum(t) + jnp.sum(f)

    dt_front = timeit(front, pcm)
    dt_full = timeit(full, pcm)
    dt_s2 = timeit(stage2_sum, keys)
    dt_pair = timeit(pairs, t_sel, f_sel, v_sel)

    def rate(dt):
        return batch / dt

    print(f"A front-end only : {dt_front*1e3:8.2f} ms  {rate(dt_front):10.0f} clips/s")
    print(f"B full pipeline  : {dt_full*1e3:8.2f} ms  {rate(dt_full):10.0f} clips/s")
    print(f"C stage-2 only   : {dt_s2*1e3:8.2f} ms  {rate(dt_s2):10.0f} clips/s")
    print(f"D pair-hash only : {dt_pair*1e3:8.2f} ms  {rate(dt_pair):10.0f} clips/s")


if __name__ == "__main__":
    main()

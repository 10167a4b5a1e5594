"""Worker process for the 2-process jax.distributed test (SURVEY.md §5 DCN
story).  Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each process contributes 2 virtual
CPU devices, so the mesh spans 4 global devices across 2 processes — the
same topology shape as a multi-host TPU pod slice (ICI within a process,
DCN between), minus the physical links.

Asserts the mesh-sharded matcher returns results BIT-IDENTICAL to the
NumPy golden matcher for member and non-member queries, then prints
MULTIHOST_OK for the parent to check.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from audio_ident_tpu.utils.platform import host_cache_tag  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    f"/root/repo/.jax_cache/{host_cache_tag()}-mh{os.environ['JAX_PROCESS_ID']}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.cpu_reference.fingerprint import (  # noqa: E402
    compact_hashes,
    fingerprint_np,
)
from audio_ident_tpu.cpu_reference.match import match_votes_np  # noqa: E402
from audio_ident_tpu.index.store import FingerprintIndex  # noqa: E402
from audio_ident_tpu.parallel.multihost import init_distributed  # noqa: E402
from audio_ident_tpu.parallel.sharded_index import (  # noqa: E402
    ShardedDeviceIndex,
    make_index_mesh,
    sharded_match,
)
from audio_ident_tpu.utils.audio_synth import synth_audio  # noqa: E402


def main() -> None:
    assert init_distributed(), "env vars must activate distributed mode"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    # identical index in every process (same seeds)
    idx = FingerprintIndex(max_tracks=64)
    clips = [synth_audio(np.random.default_rng(7100 + i), 8.0) for i in range(4)]
    for i, c in enumerate(clips):
        h, t, v = fingerprint_np(c)
        hc, tc = compact_hashes(h, t, v)
        idx.add_track(f"{i:032d}", hc.astype(np.int64), tc)
    idx.flush()

    mesh = make_index_mesh()  # all 4 global devices
    sdi = ShardedDeviceIndex.from_host(idx, mesh)

    def golden(qh, qt, qv):
        return match_votes_np(
            qh, qt, qv, idx.offsets, idx.tracks, idx.times,
            idx.d_hash, idx.d_track, idx.d_time, len(idx.d_hash),
            idx.track_valid,
        )

    queries = [clips[2][16000 * 1 : 16000 * 7]]
    queries.append(
        np.random.default_rng(999).normal(size=16000 * 6).astype(np.float32) * 0.1
    )
    for qi, q in enumerate(queries):
        budget = spec.max_peaks(len(q)) * spec.QUERY_PEAKS_FACTOR
        h, t, v = fingerprint_np(q, budget)
        g = golden(h.astype(np.int64), t, v)
        trk, ali, off = sharded_match(
            h.astype(np.int32), t.astype(np.int32), v, sdi, mesh
        )
        trk, ali = np.asarray(trk), np.asarray(ali)
        good = g.aligned > 0
        np.testing.assert_array_equal(trk[good], g.track[good])
        np.testing.assert_array_equal(ali[good], g.aligned[good])
        if qi == 0:
            assert trk[0] == 2 and ali[0] > spec.STRONG_MATCH_HASHES

    print(f"MULTIHOST_OK process={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()

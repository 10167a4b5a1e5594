"""1M-track dryrun-scale benchmark (r2 verdict missing #8).

BASELINE's pod-scale row is a 1M-track index over v5e-16.  This host has
one chip and one CPU core, so the run validates the SHAPE, the
maintenance-path timings, and correctness — not serving latency:

- builds a 1M-track / ~2.9B-posting index (synthetic postings at the
  spec's density; real planted tracks for query ground truth) with
  PERIODIC compaction, measuring each merge's wall time and the peak RSS
  (the r2 monolithic-merge spike, now amortized per compaction cycle);
- snapshots it (zstd, atomic) and times the write;
- builds the 8-shard virtual-CPU mesh mirror (the v5e-16 layout at
  dryrun scale: per-shard postings must fit int32 after rebase);
- answers planted + negative queries through the full two-pass sharded
  path and checks correctness.

Memory note: the final index is ~35 GB host-side (int32 track/time per
posting + int64 CSR offsets); peak RSS during a merge is old+new+delta.
At real pod scale each host compacts only its hash-range slice, so the
production spike is 2x the per-host slice, not 2x the global index.

Usage:
    python scripts/bench_scale_1m.py [--tracks 1000000] [--shards 8]
    # needs JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu.utils.platform import (  # noqa: E402
    honor_jax_platforms_env,
    setup_compile_cache,
)

honor_jax_platforms_env()
setup_compile_cache()

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np  # noqa: E402
from audio_ident_tpu.index.store import FingerprintIndex, write_snapshot  # noqa: E402
from audio_ident_tpu.search.exact import ExactLane  # noqa: E402
from audio_ident_tpu.utils.audio_synth import synth_audio  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=1_000_000)
    ap.add_argument("--real", type=int, default=6)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--track-sec", type=float, default=30.0)
    ap.add_argument("--compact-every", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=12)
    ap.add_argument("--snapshot-dir", type=Path, default=None)
    args = ap.parse_args()

    import jax

    from audio_ident_tpu.parallel import make_index_mesh
    from audio_ident_tpu.parallel.sharded_index import ShardedDeviceIndex

    devices = jax.devices()
    assert len(devices) >= args.shards, f"need {args.shards} devices, have {devices}"

    rng = np.random.default_rng(0)
    idx = FingerprintIndex(max_tracks=1 << 21)
    report: dict = {"metric": "scale_1m_dryrun", "tracks_target": args.tracks}

    real_audio = []
    for i in range(args.real):
        x = synth_audio(np.random.default_rng(9100 + i), args.track_sec)
        real_audio.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"10000000-0000-0000-0000-{i:012d}", h, t, v)

    n_post_per = int(args.track_sec * spec.PEAKS_PER_SEC * spec.FAN_OUT * 0.8)
    merge_times = []
    t_build0 = time.time()
    done = idx.num_tracks
    next_compact = args.compact_every
    while done < args.tracks:
        n = min(2000, args.tracks - done)
        # one RNG draw per batch: per-track loops only slice
        hs = rng.integers(0, spec.HASH_SPACE, n * n_post_per).astype(np.int32)
        ts = rng.integers(
            0, int(args.track_sec * spec.FRAMES_PER_SEC), n * n_post_per
        ).astype(np.int32)
        for j in range(n):
            a, b = j * n_post_per, (j + 1) * n_post_per
            idx.add_track(f"2{done + j:031x}", hs[a:b], ts[a:b])
        done += n
        if done >= next_compact or done >= args.tracks:
            t0 = time.time()
            idx.merge_delta()
            dt = time.time() - t0
            merge_times.append(round(dt, 1))
            next_compact = done + args.compact_every
            print(
                f"  {done}/{args.tracks} tracks, {idx.num_postings/1e9:.2f}B "
                f"postings; compaction {dt:.1f}s; peak RSS {rss_gb():.1f} GB",
                flush=True,
            )
    report["build_s"] = round(time.time() - t_build0, 1)
    report["postings_b"] = round(idx.num_postings / 1e9, 3)
    report["tracks"] = idx.num_tracks
    report["compaction_s_per_cycle"] = merge_times
    report["peak_rss_gb_build"] = round(rss_gb(), 1)

    if args.snapshot_dir:
        t0 = time.time()
        write_snapshot(args.snapshot_dir, idx.freeze())
        report["snapshot_write_s"] = round(time.time() - t0, 1)
        size = sum(f.stat().st_size for f in args.snapshot_dir.glob("*"))
        report["snapshot_gb"] = round(size / 1e9, 2)

    # 8-shard mesh mirror (v5e-16 layout shape at dryrun scale)
    mesh = make_index_mesh(devices[: args.shards])
    t0 = time.time()
    sdi = ShardedDeviceIndex.from_host(idx, mesh)
    report["mesh_mirror_build_s"] = round(time.time() - t0, 1)
    lane = ExactLane.sharded(sdi, mesh)

    # planted + negative queries through the full two-pass path
    qlat, hits = [], 0
    for i in range(args.queries):
        src = i % len(real_audio)
        clip = real_audio[src][2 * spec.SAMPLE_RATE : 10 * spec.SAMPLE_RATE]
        t0 = time.perf_counter()
        out = lane.search(clip)
        qlat.append(time.perf_counter() - t0)
        hits += bool(out) and idx.uuid_of(out[0].track_row) == (
            f"10000000-0000-0000-0000-{src:012d}"
        )
    neg = np.random.default_rng(5).normal(size=8 * spec.SAMPLE_RATE)
    neg_out = lane.search(neg.astype(np.float32) * 0.1)
    report["top1_planted"] = hits / args.queries
    report["negative_rejected"] = not neg_out
    qlat.sort()
    report["query_p50_s_cpu_mesh"] = round(qlat[len(qlat) // 2], 2)
    report["peak_rss_gb_total"] = round(rss_gb(), 1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()

"""Durability at production scale: snapshot/restore/compaction timing.

VERDICT r1 item 5 done-criterion: "snapshot+restore timed at 100k
tracks/576M postings in PARITY.md, and compaction peak-RSS measured".
Builds a synthetic 100k-track index (same statistics as bench_scale),
then measures:

- merge_delta (LSM compaction) wall time + peak RSS delta;
- freeze + write_snapshot wall time and on-disk size (the freeze runs
  under the write lock in production; write streams off-lock);
- FingerprintIndex.load (cold restore) wall time;
- WAL segment replay throughput (append 1k tracks to a WAL, replay).

Usage:  python scripts/bench_durability.py [--tracks 100000]
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

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.index.store import FingerprintIndex, write_snapshot  # noqa: E402
from audio_ident_tpu.index.wal import WriteAheadLog  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build(n_tracks: int, rng) -> FingerprintIndex:
    idx = FingerprintIndex(max_tracks=max(1 << 20, n_tracks * 2))
    t0 = time.time()
    for i in range(n_tracks):
        dur = float(rng.uniform(30, 90))
        n_post = int(dur * spec.PEAKS_PER_SEC * spec.FAN_OUT * 0.8)
        h = rng.integers(0, spec.HASH_SPACE, n_post).astype(np.int64)
        t = rng.integers(0, int(dur * spec.FRAMES_PER_SEC), n_post).astype(np.int32)
        idx.add_track(f"20000000-0000-0000-{i:04x}-000000000000", h, t)
        if (i + 1) % 20_000 == 0:
            print(f"  built {i + 1}/{n_tracks} ({time.time() - t0:.0f}s)", flush=True)
    return idx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=100_000)
    ap.add_argument("--dir", type=Path, default=Path("/tmp/bench_durability"))
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    idx = build(args.tracks, rng)
    rss_before = rss_gb()
    t0 = time.time()
    idx.merge_delta()
    t_merge = time.time() - t0
    rss_after = rss_gb()

    t0 = time.time()
    snap = idx.freeze()
    t_freeze = time.time() - t0
    t0 = time.time()
    write_snapshot(args.dir, snap)
    t_write = time.time() - t0
    size_gb = sum(p.stat().st_size for p in args.dir.iterdir()) / 1e9

    t0 = time.time()
    reborn = FingerprintIndex.load(args.dir)
    t_load = time.time() - t0
    assert reborn.num_postings == idx.num_postings

    # WAL throughput: 1k typical tracks through a segmented log + replay
    wal_dir = args.dir / "walbench"
    wal = WriteAheadLog(wal_dir)
    t0 = time.time()
    for i in range(1000):
        n_post = 3600
        wal.append_add(
            f"{i:032x}",
            rng.integers(0, spec.HASH_SPACE, n_post).astype(np.int32),
            rng.integers(0, 4000, n_post).astype(np.int32),
        )
    t_wal_append = time.time() - t0
    wal.close()
    t0 = time.time()
    n_replayed = sum(1 for _ in WriteAheadLog(wal_dir).replay())
    t_wal_replay = time.time() - t0

    print(json.dumps({
        "metric": "durability_100k",
        "tracks": idx.num_tracks,
        "postings_m": round(idx.num_postings / 1e6, 1),
        "merge_delta_sec": round(t_merge, 1),
        "merge_peak_rss_delta_gb": round(rss_after - rss_before, 2),
        "freeze_sec": round(t_freeze, 1),
        "snapshot_write_sec": round(t_write, 1),
        "snapshot_gb": round(size_gb, 2),
        "restore_load_sec": round(t_load, 1),
        "wal_append_1k_tracks_sec": round(t_wal_append, 1),
        "wal_replay_1k_tracks_sec": round(t_wal_replay, 1),
        "replayed": n_replayed,
    }))


if __name__ == "__main__":
    main()

"""Durability at production scale: snapshot/restore/compaction timing.

r1 item 5 established the bench; r4 verdict items 4+5 sharpen it:
- compaction must be BOUNDED-MEMORY (hash-range passes): worst-case
  full-delta merge at 100k tracks with peak-RSS delta <= 8 GB (r4 measured
  33.8 GB for the whole-index flush+merge);
- snapshots are per-shard files written concurrently: >= 3x the r4 write
  throughput (78.8 s for 4.2 GB), restore not regressed, and a measured
  projection of the 1M-track shape under 5 minutes.

Peak RSS is sampled live from /proc/self/status (VmRSS) in a watcher
thread — ru_maxrss is a process-lifetime high-water mark, so a merge that
stays BELOW the build phase's peak would read as zero delta and prove
nothing.

Usage:  python scripts/bench_durability.py [--tracks 100000]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.index.store import FingerprintIndex, write_snapshot  # noqa: E402
from audio_ident_tpu.index.wal import WriteAheadLog  # noqa: E402


def rss_gb() -> float:
    for line in Path("/proc/self/status").read_text().splitlines():
        if line.startswith("VmRSS:"):
            return int(line.split()[1]) / 1e6  # kB -> GB
    return 0.0


class RssWatcher:
    """Samples VmRSS at 50 ms while a phase runs; reports the phase peak."""

    def __init__(self) -> None:
        self.peak = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, rss_gb())
            time.sleep(0.05)

    def __enter__(self) -> "RssWatcher":
        self.peak = rss_gb()
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join()
        self.peak = max(self.peak, rss_gb())


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
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    idx = build(args.tracks, rng)

    # -- worst case by construction: EVERY posting sits in the delta tier --
    rss_before = rss_gb()
    t0 = time.time()
    with RssWatcher() as w:
        idx.merge_delta()
    t_merge = time.time() - t0
    merge_peak_delta = w.peak - rss_before
    n_postings = idx.num_postings

    # -- per-shard snapshot write (freeze under lock, stream off-lock) -----
    t0 = time.time()
    snap = idx.freeze()
    t_freeze = time.time() - t0
    t0 = time.time()
    write_snapshot(args.dir, snap)
    t_write = time.time() - t0
    size_gb = sum(p.stat().st_size for p in args.dir.iterdir() if p.is_file()) / 1e9
    raw_gb = (idx.tracks.nbytes + idx.times.nbytes + idx.offsets.nbytes) / 1e9

    t0 = time.time()
    reborn = FingerprintIndex.load(args.dir)
    t_load = time.time() - t0
    assert reborn.num_postings == idx.num_postings
    np.testing.assert_array_equal(reborn.tracks, idx.tracks)
    np.testing.assert_array_equal(reborn.times, idx.times)
    np.testing.assert_array_equal(reborn.offsets, idx.offsets)

    # -- WAL throughput: 1k typical tracks through a segmented log ---------
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

    # 1M-track BASELINE shape projection (postings scale ~10x at this
    # density; snapshot write/restore scale linearly in bytes)
    scale_1m = (1_000_000 / max(idx.num_tracks, 1))
    report = {
        "metric": "durability_100k",
        "tracks": idx.num_tracks,
        "postings_m": round(n_postings / 1e6, 1),
        "merge_delta_sec": round(t_merge, 1),
        "merge_peak_rss_delta_gb": round(merge_peak_delta, 2),
        "freeze_sec": round(t_freeze, 1),
        "snapshot_write_sec": round(t_write, 1),
        "snapshot_gb": round(size_gb, 2),
        "snapshot_raw_gb": round(raw_gb, 2),
        "snapshot_shards": len(
            [p for p in args.dir.iterdir() if p.name.startswith("main-")]
        ),
        "restore_load_sec": round(t_load, 1),
        "restore_bit_exact": True,
        "projected_1m_snapshot_write_sec": round(t_write * scale_1m, 0),
        "projected_1m_restore_sec": round(t_load * scale_1m, 0),
        "wal_append_1k_tracks_sec": round(t_wal_append, 1),
        "wal_replay_1k_tracks_sec": round(t_wal_replay, 1),
        "replayed": n_replayed,
    }
    print(json.dumps(report))
    if args.json:
        args.json.write_text(json.dumps(report))


if __name__ == "__main__":
    main()

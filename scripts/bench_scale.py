"""Scale benchmark: identify latency against a large synthetic index.

BASELINE's second headline metric is p50 identify latency on a 100k-track
index.  Building 100k tracks from real audio takes hours, so the index is
synthesized with realistic statistics (tracks of 30-240 s at the spec's
20 peaks/s * fan-out 6 posting density, uniform hash distribution — the
worst case for bucket skew), while QUERIES are real: actual audio
fingerprinted on-device, with planted query tracks so the match path does
real vote accumulation.

Usage:
    python scripts/bench_scale.py [--tracks 100000] [--queries 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np  # noqa: E402
from audio_ident_tpu.index.match import DeviceIndex  # noqa: E402
from audio_ident_tpu.index.store import FingerprintIndex  # noqa: E402
from audio_ident_tpu.search.exact import ExactLane  # noqa: E402
from audio_ident_tpu.utils.audio_synth import synth_audio  # noqa: E402


def build_index(n_tracks: int, n_real: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    idx = FingerprintIndex(max_tracks=max(1 << 20, n_tracks * 2))

    # real tracks (planted queries)
    real_audio = []
    for i in range(n_real):
        x = synth_audio(np.random.default_rng(7000 + i), 30.0)
        real_audio.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"10000000-0000-0000-0000-{i:012d}", h, t, v)

    # synthetic bulk: batched append straight into the pending list
    t0 = time.time()
    batch = 1000
    done = n_real
    while done < n_tracks:
        n = min(batch, n_tracks - done)
        for j in range(n):
            dur = float(rng.uniform(30, 90))
            n_post = int(dur * spec.PEAKS_PER_SEC * spec.FAN_OUT * 0.8)
            h = rng.integers(0, spec.HASH_SPACE, n_post).astype(np.int64)
            t = rng.integers(
                0, int(dur * spec.FRAMES_PER_SEC), n_post
            ).astype(np.int32)
            idx.add_track(f"20000000-0000-0000-{done + j:04x}-000000000000", h, t)
        done += n
        if done % 20_000 < batch:
            print(f"  built {done}/{n_tracks} tracks ({time.time()-t0:.0f}s)")
    t_build = time.time() - t0
    t0 = time.time()
    idx.merge_delta()
    t_merge = time.time() - t0
    print(
        f"index: {idx.num_tracks} tracks, {idx.num_postings/1e6:.0f}M postings "
        f"(build {t_build:.0f}s, merge {t_merge:.1f}s)"
    )
    return idx, real_audio


def bench_ingest(n_tracks: int = 64, seconds: float = 30.0) -> dict:
    """Bulk-ingest throughput: fingerprint batches on-device + host append
    (the per-file path the service's batch CLI drives)."""
    import jax

    from audio_ident_tpu.ops.fingerprint import fingerprint_batch

    sr = spec.SAMPLE_RATE
    n = int(seconds * sr)
    budget = spec.max_peaks(n)
    rng = np.random.default_rng(0)
    batch = 16
    idx = FingerprintIndex(max_tracks=1 << 12)
    x = jax.device_put(rng.standard_normal((batch, n)).astype(np.float32))
    # warm INCLUDING the readback path, twice (first call compiles)
    for _ in range(2):
        h, t, v = (np.asarray(a) for a in fingerprint_batch(x, budget))

    t0 = time.perf_counter()
    done = 0
    while done < n_tracks:
        h, t, v = (np.asarray(a) for a in fingerprint_batch(x, budget))
        for j in range(batch):
            idx.add_track(f"{done + j:032x}", h[j].astype(np.int64), t[j], v[j])
        done += batch
    idx.flush()
    dt = time.perf_counter() - t0
    return {
        "metric": "ingest_tracks_per_sec_30s",
        "tracks_per_sec": round(done / dt, 1),
        "audio_seconds_per_sec": round(done * seconds / dt, 0),
        "postings": idx.num_postings,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=100_000)
    ap.add_argument("--real", type=int, default=8)
    ap.add_argument("--queries", type=int, default=24)
    ap.add_argument("--ingest", action="store_true", help="ingest throughput only")
    args = ap.parse_args()

    if args.ingest:
        import jax

        from audio_ident_tpu.utils.platform import setup_compile_cache

        setup_compile_cache("/root/repo/.jax_cache_tpu")
        print(json.dumps(bench_ingest()))
        return

    import jax

    from audio_ident_tpu.utils.platform import setup_compile_cache

    setup_compile_cache("/root/repo/.jax_cache_tpu")

    idx, real_audio = build_index(args.tracks, args.real)
    t0 = time.time()
    di = DeviceIndex.from_host(idx)
    print(f"device upload: {time.time()-t0:.1f}s")
    lane = ExactLane(di)

    # warm both query paths
    lane.search(np.zeros(4 * spec.SAMPLE_RATE, np.float32))
    lane.search(np.zeros(8 * spec.SAMPLE_RATE, np.float32))

    lat = []
    hits = 0
    rng = np.random.default_rng(1)
    for i in range(args.queries):
        src = i % len(real_audio)
        start = int(rng.integers(0, 20)) * spec.SAMPLE_RATE
        clip = real_audio[src][start : start + 8 * spec.SAMPLE_RATE].copy()
        clip += (0.2 * clip.std() * rng.standard_normal(len(clip))).astype(np.float32)
        t0 = time.perf_counter()
        out = lane.search(clip)
        lat.append((time.perf_counter() - t0) * 1000)
        expected = f"10000000-0000-0000-0000-{src:012d}"
        got = idx.uuid_of(out[0].track_row) if out else None
        hits += got == expected

    lat.sort()
    result = {
        "metric": "identify_p50_ms_100k",
        "tracks": idx.num_tracks,
        "postings_m": round(idx.num_postings / 1e6, 1),
        "p50_ms": round(lat[len(lat) // 2], 1),
        "p90_ms": round(lat[int(len(lat) * 0.9)], 1),
        "top1": hits / args.queries,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

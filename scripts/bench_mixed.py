"""Mixed-workload benchmark: query latency under ingest + compaction + snapshot.

BASELINE's pod row (and SURVEY §6's north star) specifies "concurrent bulk
ingest + query"; round 3 only measured concurrent *searches*
(scripts/bench_concurrency.py).  This bench holds a sustained exact-query
load while, in sequence:

  phase "baseline"  — nothing else running (the reference point);
  phase "ingest"    — a batch ingest streams tracks in through the real
                      fingerprint path (single-writer lock + WAL appends);
  phase "compact"   — an LSM delta->main merge runs (the serving-path
                      trigger wired in r3, state._maybe_compact);
  phase "snapshot"  — a full durable snapshot (freeze under the lock,
                      zstd stream off-lock) writes to disk.

and reports query p50/p95 per phase plus degradation vs baseline.  The
pre-populated index uses synthetic postings at the spec's density (the
bench_scale_1m.py trick) so a 100k-track index builds in minutes; planted
REAL tracks provide query ground truth, and every query's correctness is
asserted, not just timed.

Run on the real chip (defaults: 100k tracks, ~20 s per phase):
    python scripts/bench_mixed.py [--tracks 100000] [--phase-sec 20]
Quick CPU smoke:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/bench_mixed.py \
        --tracks 2000 --phase-sec 5 --ingest-tracks 40
"""

from __future__ import annotations

import argparse
import asyncio
import json
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
from audio_ident_tpu.service.state import EngineState  # noqa: E402
from audio_ident_tpu.utils.audio_synth import synth_audio  # noqa: E402


def pctl(xs: list[float], p: float) -> float:
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


async def bench(args: argparse.Namespace) -> dict:
    import tempfile

    # a persistent --data-root keeps the snapshot phase's output on disk so
    # the 100k HTTP latency run (scripts/eval_latency.py against a service
    # booted from this index) reuses the pre-populated index for free
    data_root = args.data_root or Path(tempfile.mkdtemp(prefix="bench_mixed_"))
    engine = EngineState(
        max_tracks=1 << 20,
        index_dir=data_root / "index",
        vector_dir=None,
        # threshold sized so the phase-B ingest crosses it and the
        # SERVING-PATH trigger (not a manual call) fires the compaction
        compact_delta_postings=args.compact_threshold,
    )

    # -- pre-populate: planted real tracks + synthetic bulk ------------------
    # (skipped when --data-root restored an already-populated snapshot; the
    # planted audio is regenerated deterministically for query ground truth)
    rng = np.random.default_rng(0)
    n_real = 6
    restored = engine.fp_index.num_tracks >= args.tracks
    real_audio = []
    for i in range(n_real):
        x = synth_audio(np.random.default_rng(8800 + i), 30.0)
        real_audio.append(x)
        if not restored:
            h, t, v = fingerprint_np(x)
            engine.fp_index.add_track(f"20000000-0000-0000-0000-{i:012d}", h, t, v)
    n_post_per = int(30.0 * spec.PEAKS_PER_SEC * spec.FAN_OUT * 0.8)
    done = engine.fp_index.num_tracks
    while done < args.tracks:
        n = min(2000, args.tracks - done)
        hs = rng.integers(0, spec.HASH_SPACE, n * n_post_per).astype(np.int64)
        ts = rng.integers(0, int(30.0 * spec.FRAMES_PER_SEC), n * n_post_per).astype(
            np.int32
        )
        for j in range(n):
            engine.fp_index.add_track(
                f"30000000-0000-0000-0000-{done + j:012d}",
                hs[j * n_post_per : (j + 1) * n_post_per],
                ts[j * n_post_per : (j + 1) * n_post_per],
            )
        done += n
    # fold the synthetic bulk into the main CSR so the bench starts compacted
    engine.fp_index.merge_delta()
    print(
        f"pre-populated {engine.fp_index.num_tracks} tracks, "
        f"{engine.fp_index.num_postings} postings",
        file=sys.stderr,
    )

    # warm every query shape (compiles off the timed path)
    await engine.warmup()
    queries = [a[16000 * 4 : 16000 * 12] for a in real_audio]
    for q in queries[:1]:
        await engine.exact_search(q)

    # -- sustained query loop, tagged by phase --------------------------------
    lat_by_phase: dict[str, list[float]] = {}
    phase = {"name": "baseline"}
    misses = []

    async def query_loop(stop: asyncio.Event) -> None:
        i = 0
        while not stop.is_set():
            q = queries[i % len(queries)]
            want = i % len(queries)
            t0 = time.perf_counter()
            res = await engine.exact_search(q)
            dt = (time.perf_counter() - t0) * 1e3
            lat_by_phase.setdefault(phase["name"], []).append(dt)
            if not res or res[0].track_row != want:
                misses.append((phase["name"], i))
            i += 1

    async def run_phase(name: str, activity) -> dict:
        """Run `activity` (or idle) for >= phase_sec while queries flow."""
        phase["name"] = name
        t0 = time.perf_counter()
        act = asyncio.create_task(activity()) if activity else None
        while time.perf_counter() - t0 < args.phase_sec or (
            act is not None and not act.done()
        ):
            await asyncio.sleep(0.05)
            # bound runaway activities (compaction at 100k is seconds)
            if time.perf_counter() - t0 > args.phase_sec * 30:
                break
        if act is not None:
            await act
        return {"wall_s": round(time.perf_counter() - t0, 2)}

    async def ingest_activity() -> None:
        engine.defer_rewarm = True  # the batch driver's production setting
        try:
            for i in range(args.ingest_tracks):
                x = synth_audio(np.random.default_rng(7700 + i), 30.0)
                await engine.fingerprint_and_index(
                    f"40000000-0000-0000-0000-{i:012d}", x
                )
        finally:
            engine.defer_rewarm = False

    async def compact_activity() -> None:
        merged = await engine.compact()
        print(f"compaction merged {merged} postings", file=sys.stderr)

    async def snapshot_activity() -> None:
        await engine.snapshot()

    stop = asyncio.Event()
    ql = asyncio.create_task(query_loop(stop))
    phases = {}
    phases["baseline"] = await run_phase("baseline", None)
    delta_before = engine.fp_index.delta_count
    phases["ingest"] = await run_phase("ingest", ingest_activity)
    # if the serving-path trigger already fired mid-ingest, compact()
    # below is a no-op and the phase measures a second merge of whatever
    # delta remains — both are the production behavior
    phases["compact"] = await run_phase("compact", compact_activity)
    phases["snapshot"] = await run_phase("snapshot", snapshot_activity)
    phases["baseline_after"] = await run_phase("baseline_after", None)
    stop.set()
    await ql

    base_p50 = pctl(lat_by_phase["baseline"], 50)
    report: dict = {
        "metric": "mixed_workload_query_latency",
        "tracks": engine.fp_index.num_tracks,
        "postings": int(engine.fp_index.num_postings),
        "ingested_during_bench": args.ingest_tracks,
        "delta_postings_at_ingest_start": int(delta_before),
        "compaction_runs": engine.compaction_stats["runs"],
        "query_misses": len(misses),
        "phases": {},
    }
    for name, info in phases.items():
        xs = lat_by_phase.get(name, [])
        report["phases"][name] = {
            **info,
            "queries": len(xs),
            "p50_ms": round(pctl(xs, 50), 1),
            "p95_ms": round(pctl(xs, 95), 1),
            "p50_vs_baseline": round(pctl(xs, 50) / base_p50, 2) if xs else None,
        }
    await engine.close()
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=100_000)
    ap.add_argument("--phase-sec", type=float, default=20.0)
    ap.add_argument("--ingest-tracks", type=int, default=150)
    ap.add_argument("--compact-threshold", type=int, default=60_000)
    ap.add_argument("--data-root", type=Path, default=None)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    report = asyncio.run(bench(args))
    print(json.dumps(report, indent=2))
    if args.json:
        args.json.write_text(json.dumps(report))
    assert report["query_misses"] == 0, "queries returned wrong tracks"


if __name__ == "__main__":
    main()

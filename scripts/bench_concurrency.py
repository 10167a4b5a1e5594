"""Concurrency bench: concurrent exact searches sharing device dispatches.

VERDICT r1 item 4 done-criterion: "a concurrency bench showing >1 request
sharing a dispatch".  Builds an engine with real tracks on the current
backend, AOT-warms the co-batched shapes, then fires bursts of concurrent
searches and reports wall-clock + dispatch counts with micro-batching on
vs off.

Run on the real chip:  python scripts/bench_concurrency.py
"""

from __future__ import annotations

import asyncio
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    from audio_ident_tpu.utils.platform import setup_compile_cache

    setup_compile_cache()

    from audio_ident_tpu.service.state import EngineState
    from audio_ident_tpu.utils.audio_synth import synth_audio

    n_tracks = 64
    burst = 8
    rounds = 12

    st = EngineState(max_tracks=1 << 10)
    rng = np.random.default_rng(7)
    clips = [synth_audio(rng, 30.0) for _ in range(n_tracks)]
    for i, c in enumerate(clips):
        asyncio.run(
            st.fingerprint_and_index(f"00000000-0000-0000-0000-{i:012d}", c)
        )
    st._tpu.submit(lambda: None).result()  # drain background rewarm

    queries = [
        clips[i % n_tracks][16000 * 3 : 16000 * 11] for i in range(burst)
    ]

    async def one_burst():
        return await asyncio.gather(*(st.exact_search(q) for q in queries))

    def run_rounds(label: str) -> dict:
        # warm the path once, then time
        res = asyncio.run(one_burst())
        assert all(r and r[0].track_row == i % n_tracks for i, r in enumerate(res))
        st.dispatch_stats.update(exact_dispatches=0, exact_requests=0)
        t0 = time.perf_counter()
        for _ in range(rounds):
            asyncio.run(one_burst())
        dt = time.perf_counter() - t0
        return {
            "mode": label,
            "burst": burst,
            "rounds": rounds,
            "wall_ms_per_burst": round(dt / rounds * 1e3, 1),
            "dispatches": st.dispatch_stats["exact_dispatches"],
            "requests": st.dispatch_stats["exact_requests"],
        }

    # off: combining disabled (no shapes marked warm)
    st._batched_warm.clear()
    off = run_rounds("sequential")

    # on: AOT-warm co-batched shapes, then burst
    st.start_micro_batch_warm()
    st._warm_thread.join(timeout=1800)
    on = run_rounds("micro-batched")

    print(json.dumps(off))
    print(json.dumps(on))
    speedup = off["wall_ms_per_burst"] / on["wall_ms_per_burst"]
    print(
        json.dumps(
            {
                "metric": "micro_batch_burst_speedup",
                "value": round(speedup, 2),
                "requests_per_dispatch": round(on["requests"] / on["dispatches"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()

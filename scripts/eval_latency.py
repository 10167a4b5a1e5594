"""End-to-end HTTP search latency benchmark (multipart upload included).

Mirrors the reference's latency eval (reference:
scripts/eval_latency.py:50-390 — 3 warm-ups then timed requests,
p50/p95/p99 against targets p50 < 3 s / p95 < 5 s / p99 < 8 s).

Usage:
    python scripts/eval_latency.py --corpus eval_corpus \
        --url http://127.0.0.1:17010 [--mode exact] [--requests 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import httpx

TARGETS = {"p50_ms": 3000.0, "p95_ms": 5000.0, "p99_ms": 8000.0}


def run(url: str, corpus: Path, mode: str, n_requests: int) -> dict:
    clips = sorted(corpus.glob("clip_*.wav"))
    if not clips:
        raise SystemExit(f"no clips under {corpus}")
    latencies = []
    with httpx.Client(timeout=30.0) as client:
        for i in range(3):  # warm-ups (reference does the same)
            _send(client, url, clips[i % len(clips)], mode)
        for i in range(n_requests):
            clip = clips[i % len(clips)]
            t0 = time.perf_counter()
            r = _send(client, url, clip, mode)
            latencies.append((time.perf_counter() - t0) * 1000)
            if r.status_code not in (200,):
                print(f"WARN {clip.name}: HTTP {r.status_code}", file=sys.stderr)
    latencies.sort()

    def pct(p):
        return latencies[min(int(p / 100 * len(latencies)), len(latencies) - 1)]

    return {
        "p50_ms": pct(50),
        "p95_ms": pct(95),
        "p99_ms": pct(99),
        "mean_ms": sum(latencies) / len(latencies),
        "num_requests": len(latencies),
        "mode": mode,
    }


def _send(client, url, clip: Path, mode: str):
    return client.post(
        f"{url}/api/v1/search",
        files={"audio": (clip.name, clip.read_bytes(), "audio/wav")},
        data={"mode": mode},
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=Path, required=True)
    ap.add_argument("--url", default="http://127.0.0.1:17010")
    ap.add_argument("--mode", default="exact")
    ap.add_argument("--requests", type=int, default=30)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    metrics = run(args.url, args.corpus, args.mode, args.requests)
    print(json.dumps(metrics, indent=2))
    if args.json:
        args.json.write_text(json.dumps(metrics))
    fails = [
        f"{k}: {metrics[k]:.0f}ms vs target {t:.0f}ms"
        for k, t in TARGETS.items()
        if metrics[k] > t
    ]
    if fails:
        print("TARGET FAILURES:")
        for f in fails:
            print(" ", f)
        raise SystemExit(1)
    print("all targets met")


if __name__ == "__main__":
    main()

"""Exact-lane accuracy evaluation against an eval corpus.

Mirrors the reference's metrics and targets (reference:
scripts/eval_exact.py:46-545): top-1 by environment (clean/noisy/browser),
top-5, median offset error, false-positive rate on negative controls, and
per-query latency p50/p95.

Runs the engine DIRECTLY against the service's persisted state (catalog +
index snapshot under DATA_ROOT), so accuracy is measured without HTTP
overhead (eval_latency.py covers the HTTP path).

Usage:
    DATA_ROOT=./data python scripts/eval_exact.py --corpus eval_corpus \
        [--json exact_metrics.json]
"""

from __future__ import annotations

import argparse
import csv
import json
import statistics
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

from audio_ident_tpu.index.match import DeviceIndex  # noqa: E402
from audio_ident_tpu.index.store import FingerprintIndex  # noqa: E402
from audio_ident_tpu.search.exact import ExactLane  # noqa: E402
from audio_ident_tpu.service.audio import decode_wav  # noqa: E402
from audio_ident_tpu.service.catalog import Catalog  # noqa: E402
from audio_ident_tpu.service.settings import load_settings  # noqa: E402

# The FROZEN target set is the reference's, name-for-name and
# value-for-value (reference: scripts/eval_exact.py:45-53): top1_mic and
# top5_mic are scored against 0.75/0.85 on the mic-capture clips ONLY.
# Round 2 remapped these onto pooled categories, which hid a mic FAIL —
# restored per the r2 verdict ("report the frozen categories as frozen").
TARGETS = {
    "top1_clean": 0.98,
    "top1_mic": 0.75,
    "top1_browser": 0.70,
    "top5_mic": 0.85,
    "median_offset_error_sec": 0.5,
    "false_positive_rate": 0.02,
    "latency_p95_ms": 2000.0,
}
# Our own ADDITIONAL targets on top of the frozen set (the corpus is
# harder than the reference's: its builder mixes white noise at 20 dB,
# reference: scripts/build_eval_corpus.py:603-606, while ours sweeps
# 20->0 dB over white/pink/babble).  ``top1_noisy`` pools >=10 dB points.
EXTRA_TARGETS = {
    "top1_noisy": 0.75,
    "top5_overall": 0.85,
}


def wilson_ci(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """Wilson 95% score interval for a binomial proportion (r3 verdict
    item 2: per-cell claims need confidence intervals, not ~11-clip point
    estimates)."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5)
    return (max(0.0, center - half), min(1.0, center + half))


def _category(env: str) -> str:
    """Map fine-grained corpus environments onto target categories.
    ``clean``/``mic``/``browser`` are the reference's frozen categories
    (reference: scripts/eval_exact.py:45-53; codec round-trips ride the
    browser-capture chain there too).  ``noisy`` (>=10 dB SNR) and
    ``noisy_hard`` (<10 dB) are our harder SNR-sweep additions."""
    if env == "clean":
        return "clean"
    if env.startswith("snr"):
        db = int(env[3:].split("-")[0])
        return "noisy" if db >= 10 else "noisy_hard"
    if env == "mic":
        return "mic"
    return "browser"  # browser chain + opus/mp3 (real or -sim) round-trips


def evaluate(corpus: Path, settings) -> dict:
    catalog = Catalog(settings.catalog_file)
    fp_index = FingerprintIndex.load(settings.index_dir)
    lane = ExactLane(DeviceIndex.from_host(fp_index))
    title_to_id = {}
    rows, _total = catalog.list_tracks(page=1, page_size=100)
    page = 1
    while rows:
        for r in rows:
            title_to_id[r.title] = r.id
        page += 1
        rows, _ = catalog.list_tracks(page=page, page_size=100)

    per_env_hits: dict[str, list[int]] = {}
    per_cat_hits: dict[str, list[int]] = {}
    per_cat_top5: dict[str, list[int]] = {}
    top5_hits: list[int] = []
    offset_errors: list[float] = []
    negatives_total = 0
    negatives_matched = 0
    latencies: list[float] = []

    with (corpus / "ground_truth.csv").open() as f:
        gt = list(csv.DictReader(f))

    # warm every query-bucket shape before timing (the service warms at
    # startup; this direct-engine path must too, or p95 measures compiles)
    seen_buckets: set[int] = set()
    for row in gt:
        n = len(decode_wav((corpus / row["clip"]).read_bytes()).pcm)
        if n not in seen_buckets:
            seen_buckets.add(n)
            lane.search(np.zeros(n, np.float32))

    negatives_floor_matched = 0
    top5_asserted_hits: list[int] = []

    for row in gt:
        pcm = decode_wav((corpus / row["clip"]).read_bytes()).pcm
        t0 = time.perf_counter()
        results = lane.search(pcm, max_results=5)
        latencies.append((time.perf_counter() - t0) * 1000)
        # two operating points (r3 verdict item 5):
        # - ASSERTED: low_confidence filtered out — the gated verdict the
        #   service stands behind (this is what the frozen top-1/FPR
        #   targets score, same semantics as the pre-r4 hard gate);
        # - FLOOR LIST: everything returned — the reference's floor-only
        #   semantics (app/search/exact.py:109-121), which top-5 recall
        #   scores (a rank-2..5 true match is still in the response).
        asserted = [c for c in results if not c.low_confidence]
        asserted_ids = [fp_index.uuid_of(c.track_row) for c in asserted]
        result_ids = [fp_index.uuid_of(c.track_row) for c in results]

        if row["type"] == "negative":
            negatives_total += 1
            if asserted:
                negatives_matched += 1
            if results:
                negatives_floor_matched += 1
            continue

        expected = title_to_id.get(row["source"])
        hit1 = bool(asserted_ids) and asserted_ids[0] == expected
        env = row["environment"]
        per_env_hits.setdefault(env, []).append(int(hit1))
        per_cat_hits.setdefault(_category(env), []).append(int(hit1))
        hit5 = int(expected in result_ids)
        per_cat_top5.setdefault(_category(env), []).append(hit5)
        top5_hits.append(hit5)
        top5_asserted_hits.append(int(expected in asserted_ids))
        if hit1:
            offset_errors.append(
                abs(asserted[0].offset_seconds - float(row["offset_sec"]))
            )

    def rate(xs):
        return sum(xs) / len(xs) if xs else None

    lat_sorted = sorted(latencies)

    def pct(p):
        return lat_sorted[min(int(p / 100 * len(lat_sorted)), len(lat_sorted) - 1)]

    # accuracy-vs-SNR curve: pooled over noise kinds, one point per SNR
    snr_curve = {}
    for env, hits in sorted(per_env_hits.items()):
        if env.startswith("snr"):
            db = int(env[3:].split("-")[0])
            snr_curve.setdefault(db, []).extend(hits)

    def cell(hits: list[int]) -> dict:
        lo, hi = wilson_ci(sum(hits), len(hits))
        return {
            "rate": round(rate(hits), 4),
            "n": len(hits),
            "ci95": [round(lo, 4), round(hi, 4)],
        }

    # legacy corpora (round 1) used flat env names; fall back to them
    metrics = {
        "top1_clean": rate(per_cat_hits.get("clean", per_env_hits.get("clean", []))),
        "top1_noisy": rate(per_cat_hits.get("noisy", per_env_hits.get("noisy", []))),
        "top1_browser": rate(per_cat_hits.get("browser", per_env_hits.get("browser", []))),
        "top1_noisy_hard": rate(per_cat_hits.get("noisy_hard", [])),
        "top1_mic": rate(per_cat_hits.get("mic", [])),
        "top5_mic": rate(per_cat_top5.get("mic", [])),
        "snr_curve": {f"{db}dB": round(rate(h), 4) for db, h in sorted(snr_curve.items())},
        "snr_curve_ci": {f"{db}dB": cell(h) for db, h in sorted(snr_curve.items())},
        "per_environment": {
            env: round(rate(h), 4) for env, h in sorted(per_env_hits.items())
        },
        "per_environment_ci": {
            env: cell(h) for env, h in sorted(per_env_hits.items())
        },
        "per_category_ci": {
            cat: cell(h) for cat, h in sorted(per_cat_hits.items())
        },
        "top5_overall": rate(top5_hits),
        # top-5 with the gate applied to ranks 2-5 too (the pre-r4 hard
        # gate's semantics) — the measured cost of gating, for PARITY.md
        "top5_overall_asserted": rate(top5_asserted_hits),
        "median_offset_error_sec": (
            statistics.median(offset_errors) if offset_errors else None
        ),
        "false_positive_rate": (
            negatives_matched / negatives_total if negatives_total else None
        ),
        # FPR under the reference's floor-only semantics (any returned
        # candidate counts, flagged or not) — the measured FPR the gate
        # buys down, for PARITY.md
        "false_positive_rate_floor_list": (
            negatives_floor_matched / negatives_total if negatives_total else None
        ),
        "num_negatives": negatives_total,
        "latency_p50_ms": pct(50) if latencies else None,
        "latency_p95_ms": pct(95) if latencies else None,
        "num_queries": len(gt),
        "num_tracks": fp_index.num_tracks,
    }
    catalog.close()
    return metrics


def check_targets(metrics: dict) -> list[str]:
    failures = []
    for key, target in {**TARGETS, **EXTRA_TARGETS}.items():
        got = metrics.get(key)
        if got is None:
            continue
        ok = got <= target if ("error" in key or "rate" in key or "latency" in key) else got >= target
        if not ok:
            failures.append(f"{key}: {got:.3f} vs target {target}")
    return failures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=Path, required=True)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    settings = load_settings()
    metrics = evaluate(args.corpus, settings)
    print(json.dumps(metrics, indent=2))
    if args.json:
        args.json.write_text(json.dumps(metrics))
    failures = check_targets(metrics)
    if failures:
        print("TARGET FAILURES:")
        for f in failures:
            print(" ", f)
        raise SystemExit(1)
    print("all targets met")


if __name__ == "__main__":
    main()

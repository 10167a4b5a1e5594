"""Vibe-lane retrieval quality: MRR and nDCG@5 on the eval corpus.

Mirrors the reference's vibe metrics (reference:
scripts/eval_vibe.py:55-456 — MRR >= 0.5, nDCG@5 >= 0.6; the "playlist-
worthy" human-rating sheet stays a manual step).  Relevance ground truth
is self-retrieval: a degraded clip of track X should retrieve X highly.

Requires a CLAP checkpoint (CLAP_CHECKPOINT) or CLAP_RANDOM_INIT=1 for a
pipeline smoke run.

Usage:
    DATA_ROOT=./data python scripts/eval_vibe.py --corpus eval_corpus
"""

from __future__ import annotations

import argparse
import csv
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu.utils.platform import (  # noqa: E402
    honor_jax_platforms_env,
    setup_compile_cache,
)

honor_jax_platforms_env()
setup_compile_cache()

from audio_ident_tpu.index.store import FingerprintIndex  # noqa: E402
from audio_ident_tpu.service.audio import decode_wav  # noqa: E402
from audio_ident_tpu.service.catalog import Catalog  # noqa: E402
from audio_ident_tpu.service.settings import load_settings  # noqa: E402
from audio_ident_tpu.service.state import load_vibe_lane, resample_to_48k  # noqa: E402
from audio_ident_tpu.vector.search import DeviceVectorIndex  # noqa: E402
from audio_ident_tpu.vector.store import VectorStore  # noqa: E402

TARGETS = {"mrr": 0.5, "ndcg_at_5": 0.6}  # reference: eval_vibe.py:55-59


def evaluate(corpus: Path, settings) -> dict:
    lane = load_vibe_lane(
        settings.clap_checkpoint, random_init=settings.clap_random_init
    )
    if lane is None:
        raise SystemExit("no CLAP checkpoint configured (set CLAP_CHECKPOINT)")
    lane.threshold = 0.0  # rank everything; thresholding is a service concern
    catalog = Catalog(settings.catalog_file)
    fp_index = FingerprintIndex.load(settings.index_dir)
    store = VectorStore.load(settings.vector_dir)
    dvi = DeviceVectorIndex.from_host(store, track_valid=fp_index.track_valid)

    title_to_id = {}
    page = 1
    rows, _ = catalog.list_tracks(page=page, page_size=100)
    while rows:
        for r in rows:
            title_to_id[r.title] = r.id
        page += 1
        rows, _ = catalog.list_tracks(page=page, page_size=100)

    rr, ndcg = [], []
    with (corpus / "ground_truth.csv").open() as f:
        gt = [r for r in csv.DictReader(f) if r["type"] == "positive"]
    for row in gt:
        d = decode_wav((corpus / row["clip"]).read_bytes())
        pcm48 = resample_to_48k(d.pcm, d.sample_rate)
        scores = lane.search_scores(pcm48, dvi)
        ranked = [fp_index.uuid_of(s.track_row) for s in scores[:10]]
        expected = title_to_id.get(row["source"])
        if expected in ranked:
            rank = ranked.index(expected) + 1
            rr.append(1.0 / rank)
            ndcg.append(1.0 / math.log2(rank + 1) if rank <= 5 else 0.0)
        else:
            rr.append(0.0)
            ndcg.append(0.0)

    metrics = {
        "mrr": sum(rr) / len(rr) if rr else None,
        "ndcg_at_5": sum(ndcg) / len(ndcg) if ndcg else None,
        "num_queries": len(gt),
        "provenance": (
            "CLAP weights: RANDOM-INIT twin — no checkpoint exists in this "
            "environment; numbers exercise the full pipeline but do NOT "
            "measure retrieval quality (VERDICT r1 item 2 environment "
            "limitation). Swap in a real checkpoint via CLAP_CHECKPOINT "
            "and re-run scripts/calibrate_vibe_threshold.py."
            if settings.clap_random_init
            else f"CLAP checkpoint: {settings.clap_checkpoint}"
        ),
    }
    catalog.close()
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=Path, required=True)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    metrics = evaluate(args.corpus, load_settings())
    print(json.dumps(metrics, indent=2))
    if args.json:
        args.json.write_text(json.dumps(metrics))
    fails = [
        f"{k}: {metrics[k]:.3f} vs target {t}"
        for k, t in TARGETS.items()
        if metrics.get(k) is not None and metrics[k] < t
    ]
    if fails:
        print("TARGET FAILURES:")
        for f in fails:
            print(" ", f)
        raise SystemExit(1)
    print("all targets met")


if __name__ == "__main__":
    main()

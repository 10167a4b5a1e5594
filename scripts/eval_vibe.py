"""Vibe-lane retrieval quality: MRR, nDCG@5, and the human rating sheet.

Mirrors the reference's vibe metrics (reference:
scripts/eval_vibe.py:55-456 — MRR >= 0.5, nDCG@5 >= 0.6,
playlist_worthy_rate >= 0.60).  Relevance ground truth for MRR/nDCG is
self-retrieval: a degraded clip of track X should retrieve X highly.

The "playlist-worthy" metric needs a human: evaluation writes
``vibe_rating_sheet.csv`` next to the corpus (same columns as the
reference, scripts/eval_vibe.py:248-272) with an empty ``human_score``
column; a rater fills 1-5 per the protocol printed at the end, then
``--score-sheet vibe_rating_sheet.csv`` computes playlist_worthy_rate
(fraction of rated results scored >= 4) against the 0.60 target.

Requires a CLAP checkpoint (CLAP_CHECKPOINT) or CLAP_RANDOM_INIT=1 for a
pipeline smoke run.  docs/CLAP_RUNBOOK.md is the checkpoint-day recipe.

Usage:
    DATA_ROOT=./data python scripts/eval_vibe.py --corpus eval_corpus
    # ... fill human_score in eval_corpus/vibe_rating_sheet.csv, then:
    DATA_ROOT=./data python scripts/eval_vibe.py --corpus eval_corpus \
        --score-sheet eval_corpus/vibe_rating_sheet.csv
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
# human-rated, scored separately via --score-sheet (reference: :58)
PLAYLIST_WORTHY_TARGET = 0.60

RATING_PROTOCOL = """\
Next step: fill in human_score (1-5) in vibe_rating_sheet.csv
  5 = Perfect vibe match ('add to same playlist without hesitation')
  4 = Strong vibe match ('similar mood/energy, same playlist')
  3 = Moderate match ('some shared qualities, noticeably different')
  2 = Weak match ('I see why, but it's a stretch')
  1 = No match ('completely different vibe')
Then: python scripts/eval_vibe.py --corpus <corpus> \
--score-sheet <corpus>/vibe_rating_sheet.csv"""

RATING_FIELDS = [
    "query_path", "query_label", "result_rank", "result_track_id",
    "result_title", "result_artist", "result_similarity", "human_score",
]


def score_rating_sheet(path: Path) -> dict:
    """playlist_worthy_rate from a human-filled rating sheet (reference
    semantics: fraction of rated results scored >= 4, target 0.60)."""
    with path.open() as f:
        rows = list(csv.DictReader(f))
    scored = [r for r in rows if r.get("human_score", "").strip()]
    worthy = sum(1 for r in scored if float(r["human_score"]) >= 4.0)
    return {
        "playlist_worthy_rate": worthy / len(scored) if scored else None,
        "rated_results": len(scored),
        "unrated_results": len(rows) - len(scored),
    }


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
    track_meta: dict[str, tuple[str, str]] = {}
    page = 1
    rows, _ = catalog.list_tracks(page=page, page_size=100)
    while rows:
        for r in rows:
            title_to_id[r.title] = r.id
            track_meta[r.id] = (r.title, r.artist or "")
        page += 1
        rows, _ = catalog.list_tracks(page=page, page_size=100)

    rr, ndcg = [], []
    rating_rows: list[dict] = []
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
        # human rating sheet: top-5 per query, rater fills human_score
        # (reference columns: scripts/eval_vibe.py:248-272)
        for k, s in enumerate(scores[:5]):
            tid = fp_index.uuid_of(s.track_row)
            title, artist = track_meta.get(tid, ("", ""))
            rating_rows.append({
                "query_path": str(corpus / row["clip"]),
                "query_label": row["environment"],
                "result_rank": str(k + 1),
                "result_track_id": tid,
                "result_title": title,
                "result_artist": artist,
                "result_similarity": f"{s.final_score:.4f}",
                "human_score": "",
            })

    sheet = corpus / "vibe_rating_sheet.csv"
    with sheet.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=RATING_FIELDS)
        w.writeheader()
        w.writerows(rating_rows)

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
    ap.add_argument("--score-sheet", type=Path, default=None,
                    help="score a human-filled vibe_rating_sheet.csv "
                         "(playlist_worthy_rate vs 0.60) instead of "
                         "running retrieval")
    args = ap.parse_args()
    if args.score_sheet:
        metrics = score_rating_sheet(args.score_sheet)
        print(json.dumps(metrics, indent=2))
        if args.json:
            args.json.write_text(json.dumps(metrics))
        rate = metrics["playlist_worthy_rate"]
        if rate is None:
            raise SystemExit("no rated rows in the sheet — fill human_score first")
        if rate < PLAYLIST_WORTHY_TARGET:
            print(f"TARGET FAILURE: playlist_worthy_rate {rate:.3f} "
                  f"vs target {PLAYLIST_WORTHY_TARGET}")
            raise SystemExit(1)
        print("playlist_worthy_rate target met")
        return
    metrics = evaluate(args.corpus, load_settings())
    print(json.dumps(metrics, indent=2))
    if args.json:
        args.json.write_text(json.dumps(metrics))
    print(RATING_PROTOCOL)
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

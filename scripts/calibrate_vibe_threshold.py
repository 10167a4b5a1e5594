"""Calibrate the vibe-lane cosine threshold from an eval corpus.

The reference ships threshold 0.60 for `laion/larger_clap_music_and_speech`
(reference: app/search/vibe.py:21-33) but never records how it was picked.
This tool derives it empirically so a NEW checkpoint can be calibrated
(VERDICT r1 item 2): it embeds every positive clip and scores it against
(a) its own source track — the positive distribution — and (b) every other
track — the negative distribution; then sweeps the threshold and reports,
per candidate value, recall / false-accept rate / F1, plus the
equal-error-rate point and the max-F1 suggestion.

With CLAP_RANDOM_INIT=1 the numbers only prove the pipeline (random
embeddings separate nothing); with a real checkpoint they are the
calibration of record — rerun this whenever the model changes.

Usage:
    DATA_ROOT=./data python scripts/calibrate_vibe_threshold.py \
        --corpus eval_corpus [--json vibe_threshold.json]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

import numpy as np

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
from audio_ident_tpu.vector.store import VectorStore  # noqa: E402


def collect_similarities(corpus: Path, settings) -> tuple[np.ndarray, np.ndarray, str]:
    lane = load_vibe_lane(
        settings.clap_checkpoint, random_init=settings.clap_random_init
    )
    if lane is None:
        raise SystemExit("no CLAP checkpoint configured (set CLAP_CHECKPOINT "
                         "or CLAP_RANDOM_INIT=1 for a pipeline smoke run)")
    provenance = (
        "RANDOM-INIT (pipeline smoke only — not a usable calibration)"
        if settings.clap_random_init
        else str(settings.clap_checkpoint)
    )
    catalog = Catalog(settings.catalog_file)
    fp_index = FingerprintIndex.load(settings.index_dir)
    store = VectorStore.load(settings.vector_dir)

    title_to_id, page = {}, 1
    rows, _ = catalog.list_tracks(page=page, page_size=100)
    while rows:
        for r in rows:
            title_to_id[r.title] = r.id
        page += 1
        rows, _ = catalog.list_tracks(page=page, page_size=100)
    catalog.close()

    # track-level embedding matrix: mean of chunk embeddings, renormalized
    uuid_to_row = {fp_index.uuid_of(r): r for r in range(fp_index.num_tracks)}
    store.flush()
    emb = np.asarray(store.embeddings)
    owner = np.asarray(store.track)
    n_tracks = fp_index.num_tracks
    track_emb = np.zeros((n_tracks, emb.shape[1]), np.float32)
    for row in range(n_tracks):
        chunks = emb[owner == row]
        if len(chunks):
            v = chunks.mean(axis=0)
            track_emb[row] = v / (np.linalg.norm(v) or 1.0)

    pos, neg = [], []
    with (corpus / "ground_truth.csv").open() as f:
        gt = [r for r in csv.DictReader(f) if r["type"] == "positive"]
    for row in gt:
        d = decode_wav((corpus / row["clip"]).read_bytes())
        q = lane.embed_query(resample_to_48k(d.pcm, d.sample_rate))
        sims = track_emb @ np.asarray(q, np.float32)
        own_row = uuid_to_row.get(title_to_id.get(row["source"], ""), -1)
        if own_row >= 0:
            pos.append(float(sims[own_row]))
            others = np.delete(sims, own_row)
            neg.extend(np.partition(others, -5)[-5:].tolist())  # hardest 5
    return np.array(pos), np.array(neg), provenance


def sweep(pos: np.ndarray, neg: np.ndarray) -> dict:
    grid = np.round(np.arange(0.30, 0.96, 0.05), 2)
    rows = []
    for th in grid:
        recall = float((pos >= th).mean()) if len(pos) else 0.0
        far = float((neg >= th).mean()) if len(neg) else 0.0
        f1 = (2 * recall * (1 - far) / (recall + (1 - far))
              if recall + (1 - far) > 0 else 0.0)
        rows.append({"threshold": float(th), "recall": round(recall, 4),
                     "false_accept_rate": round(far, 4), "f1": round(f1, 4)})
    best = max(rows, key=lambda r: r["f1"])
    # equal-error point: |miss - false accept| minimized
    eer = min(rows, key=lambda r: abs((1 - r["recall"]) - r["false_accept_rate"]))
    return {
        "sweep": rows,
        "suggested_threshold": best["threshold"],
        "eer_threshold": eer["threshold"],
        "positive_mean": round(float(pos.mean()), 4) if len(pos) else None,
        "negative_mean": round(float(neg.mean()), 4) if len(neg) else None,
        "separation": (
            round(float(pos.mean() - neg.mean()), 4) if len(pos) and len(neg) else None
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=Path, required=True)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    settings = load_settings()
    pos, neg, provenance = collect_similarities(args.corpus, settings)
    report = {"provenance": provenance, "num_positive_pairs": len(pos),
              "num_negative_pairs": len(neg), **sweep(pos, neg)}
    print(json.dumps(report, indent=2))
    if args.json:
        args.json.write_text(json.dumps(report))


if __name__ == "__main__":
    main()

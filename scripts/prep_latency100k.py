"""Prepare a bench_mixed --data-root for the BASELINE headline latency run.

BASELINE's north-star table specifies "p50 identify latency on a
100k-track index ... measured by the ported latency harness" — i.e. HTTP,
through scripts/eval_latency.py (reference: scripts/eval_latency.py:50-54),
not the direct-engine number bench_scale.py reports.  bench_mixed
--data-root leaves a snapshotted 100k fingerprint index behind; this
script adds the two missing stores so the full service can boot on it:

  * catalog rows for EVERY indexed track (search responses enrich through
    the sqlite catalog; a missing row silently drops the match and would
    under-measure the serialization cost),
  * a production-shaped vector store (5 chunks x 512-d per track — 30 s
    tracks at the 10 s window / 5 s hop chunking) so vibe/both modes run
    the real top-k shape at 100k tracks,

plus query WAV clips cut from the planted ground-truth tracks (rows with
UUID 20000000-...) at several bucket lengths.

Usage:
    python scripts/prep_latency100k.py --data-root /root/bench100k
then:
    DATA_ROOT=/root/bench100k ADMIN_API_KEY=k python -m audio_ident_tpu.service
    python scripts/eval_latency.py --corpus /root/bench100k/clips --mode exact ...
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu import spec  # noqa: E402
from audio_ident_tpu.service.catalog import Catalog  # noqa: E402
from audio_ident_tpu.utils.audio_synth import synth_audio  # noqa: E402
from audio_ident_tpu.vector.store import VectorStore  # noqa: E402

CHUNK_OFFSETS = np.array([0.0, 5.0, 10.0, 15.0, 20.0], np.float32)  # 30 s track


def load_registry(index_dir: Path) -> list[str]:
    manifest = json.loads((index_dir / "MANIFEST.json").read_text())
    reg = json.loads((index_dir / manifest["registry"]).read_text())
    return reg["rows"]  # row->uuid list (see store.write_snapshot)


def write_wav(path: Path, pcm: np.ndarray, rate: int = spec.SAMPLE_RATE) -> None:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype(np.int16).tobytes())
    path.write_bytes(buf.getvalue())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", type=Path, required=True)
    ap.add_argument("--chunks-per-track", type=int, default=len(CHUNK_OFFSETS))
    args = ap.parse_args()
    root = args.data_root
    uuids = load_registry(root / "index")
    print(f"registry: {len(uuids)} tracks", file=sys.stderr)

    # -- catalog: one row per indexed track -----------------------------------
    cat_path = root / "catalog.sqlite3"
    if cat_path.exists():
        cat_path.unlink()
    cat = Catalog(cat_path)
    conn = cat._conn
    now = "2026-08-20T00:00:00+00:00"
    rows = [
        (
            u, f"Track {i}", f"Artist {i % 997}", "Bench Album", 30.0,
            spec.SAMPLE_RATE, 1, 256000, "wav", f"{i:064x}", 960000,
            f"raw/{i % 256:02x}/{i:064x}.wav", True,
            "clap-htsat-large", 512, now, now,
        )
        for i, u in enumerate(uuids)
    ]
    with conn:
        conn.executemany(
            "INSERT INTO tracks (id, title, artist, album, duration_seconds,"
            " sample_rate, channels, bitrate, format, file_hash_sha256,"
            " file_size_bytes, file_path, fp_indexed, embedding_model,"
            " embedding_dim, ingested_at, updated_at)"
            " VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)",
            rows,
        )
    cat.close()
    print(f"catalog: {len(rows)} rows -> {cat_path}", file=sys.stderr)

    # -- vector store: production chunk density, unit vectors -----------------
    n = len(uuids)
    k = args.chunks_per_track
    rng = np.random.default_rng(99)
    vs = VectorStore(dim=512)
    emb = rng.standard_normal((n * k, 512), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vs.embeddings = emb
    vs.track = np.repeat(np.arange(n, dtype=np.int32), k)
    vs.offset_sec = np.tile(CHUNK_OFFSETS[:k], n)
    vs.chunk_index = np.tile(np.arange(k, dtype=np.int32), n)
    vs.save(root / "vectors")
    print(f"vectors: {n * k} x 512 -> {root / 'vectors'}", file=sys.stderr)

    # -- query clips from the planted (real-audio) tracks ---------------------
    clips = root / "clips"
    clips.mkdir(exist_ok=True)
    n_planted = sum(1 for u in uuids if u.startswith("20000000-"))
    j = 0
    for i in range(n_planted):
        x = synth_audio(np.random.default_rng(8800 + i), 30.0)  # bench seeds
        for dur in (5.0, 8.0, 10.0):
            a = int((3 + i) * spec.SAMPLE_RATE)
            seg = x[a : a + int(dur * spec.SAMPLE_RATE)]
            write_wav(clips / f"clip_{j:04d}_t{i}_d{int(dur)}.wav", seg)
            j += 1
    print(f"clips: {j} -> {clips}", file=sys.stderr)


if __name__ == "__main__":
    main()

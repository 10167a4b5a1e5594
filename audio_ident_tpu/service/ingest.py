"""Ingestion pipeline: dedup -> decode -> store -> fingerprint -> catalog.

Mirrors the reference's 7-step per-file pipeline and sequential batch
driver (reference: audio-ident-service/app/ingest/pipeline.py:70-321):

1. SHA-256 + exact file-dup check (catalog unique column)
2. metadata extraction (host)
3. decode + duration bounds (3 s - 30 min)
4. content-addressed blob save
5. content-level near-dup check (chroma fingerprint; phase 2)
6. fingerprint -> device index (and chunk embeddings when the vibe lane
   is enabled) — one fused device batch instead of the reference's
   subprocess + sequential per-chunk CLAP loop (pipeline.py:197)
7. catalog insert

Batch ingestion is sequential per file (single-writer regime, reference:
pipeline.py:294-300).
"""

from __future__ import annotations

import asyncio
import logging
import uuid as uuidlib
from dataclasses import dataclass
from pathlib import Path

from audio_ident_tpu.service import audio as audio_io
from audio_ident_tpu.service import metadata
from audio_ident_tpu.service.catalog import Catalog, TrackRow
from audio_ident_tpu.service.settings import Settings
from audio_ident_tpu.service.state import (
    EngineState,
    resample_to_16k,
    resample_to_48k,
)

logger = logging.getLogger(__name__)

AUDIO_EXTENSIONS = {".mp3", ".wav", ".flac", ".ogg", ".m4a", ".webm", ".aac"}


@dataclass
class IngestOutcome:
    status: str  # "ingested" | "duplicate" | "error"
    track: TrackRow | None = None
    error_code: str | None = None
    error_message: str | None = None


@dataclass
class BatchReport:
    total: int = 0
    ingested: int = 0
    duplicates: int = 0
    errors: list[tuple[str, str]] = None  # (file, message)

    def __post_init__(self):
        if self.errors is None:
            self.errors = []


async def ingest_bytes(
    data: bytes,
    filename: str,
    *,
    settings: Settings,
    catalog: Catalog,
    engine: EngineState,
    rebind_existing: bool = False,
) -> IngestOutcome:
    """Ingest one in-memory audio file (steps 1-7 above).

    ``rebind_existing`` is the rebuild-index mode: a file whose hash already
    has a catalog row is re-fingerprinted and re-indexed UNDER THAT ROW
    (same uuid/title/artist) instead of being skipped as a duplicate — the
    catalog is source-of-truth metadata that an index rebuild must preserve
    (reference: Makefile:96-107 re-derives indexes, never the catalog)."""
    # 1. exact file dedup
    sha256 = await asyncio.to_thread(audio_io.compute_sha256, data)
    existing = await catalog.a_find_by_hash(sha256)
    if existing is not None:
        if not rebind_existing:
            return IngestOutcome(status="duplicate", track=existing)
        return await _reindex_existing(
            data, existing, settings=settings, catalog=catalog, engine=engine
        )

    # 2. sniff + metadata
    sniffed = audio_io.sniff_format(data)
    if sniffed is None:
        return IngestOutcome(
            status="error", error_code="UNSUPPORTED_FORMAT",
            error_message="Audio format not recognized",
        )
    fmt, _mime = sniffed
    tags = metadata.extract_tags(data, fmt)
    title = tags.title or Path(filename).stem or sha256[:12]

    # 3. decode + duration bounds
    try:
        decoded = await audio_io.decode_audio(data, fmt)
    except audio_io.DecodeError as e:
        return IngestOutcome(
            status="error", error_code="UNSUPPORTED_FORMAT",
            error_message=f"Failed to decode audio: {e}",
        )
    if decoded.duration_seconds < settings.min_duration_sec:
        return IngestOutcome(
            status="error", error_code="AUDIO_TOO_SHORT",
            error_message=(
                f"Audio too short: {decoded.duration_seconds:.1f}s "
                f"(minimum {settings.min_duration_sec:.0f}s)"
            ),
        )
    if decoded.duration_seconds > settings.max_duration_sec:
        return IngestOutcome(
            status="error", error_code="AUDIO_TOO_LONG",
            error_message=(
                f"Audio too long: {decoded.duration_seconds:.0f}s "
                f"(maximum {settings.max_duration_sec:.0f}s)"
            ),
        )

    # 4. blob save (content-addressed; source of truth for rebuild-index)
    blob_path = audio_io.raw_audio_path(settings.storage_root, sha256, fmt)
    await asyncio.to_thread(_write_blob, blob_path, data)

    # 5. content near-dup: robust-hash fingerprint + Hamming similarity
    # over the ±10% duration window (replaces fpcalc, reference:
    # pipeline.py:154-166, dedup.py:170-222)
    from audio_ident_tpu.ops import content_fp

    pcm_16k = await asyncio.to_thread(resample_to_16k, decoded.pcm, decoded.sample_rate)
    cfp = await engine.content_fingerprint(pcm_16k)
    near = await catalog.a_find_near_duration(
        decoded.duration_seconds, content_fp.spec.CFP_DURATION_TOLERANCE
    )
    dup = content_fp.is_content_duplicate(
        cfp,
        decoded.duration_seconds,
        [
            (r.id, r.chromaprint_fingerprint, r.duration_seconds)
            for r in near
            if r.chromaprint_fingerprint
        ],
    )
    if dup is not None:
        existing = await catalog.a_get_track(dup[0])
        logger.info(
            "content duplicate of %s (similarity %.3f): %s",
            dup[0], dup[1], filename,
        )
        return IngestOutcome(status="duplicate", track=existing)

    # 6. fingerprint + embed on device.  The reference gathers olaf_c and
    # the CLAP executor concurrently (pipeline.py:197); here both are jobs
    # on the single TPU queue, so they run back to back — the win is that
    # each is one batched device program instead of subprocess/per-chunk
    # loops.
    track_id = str(uuidlib.uuid4())
    try:
        n_hashes = await engine.fingerprint_and_index(track_id, pcm_16k)
    except Exception as e:  # noqa: BLE001 — map engine failure to pipeline error
        logger.exception("fingerprint indexing failed for %s", filename)
        return IngestOutcome(
            status="error", error_code="SERVICE_UNAVAILABLE",
            error_message=f"Fingerprint indexing failed: {e}",
        )
    n_chunks = 0
    if engine.vibe_enabled:
        pcm_48k = await asyncio.to_thread(
            resample_to_48k, decoded.pcm, decoded.sample_rate
        )
        try:
            n_chunks = await engine.embed_and_store(track_id, pcm_48k)
        except Exception:  # noqa: BLE001 — vibe failure degrades, not fatal
            logger.exception("chunk embedding failed for %s", filename)

    # 7. catalog insert
    track = await catalog.a_insert_track(
        id=track_id,
        title=title,
        artist=tags.artist,
        album=tags.album,
        duration_seconds=decoded.duration_seconds,
        sample_rate=decoded.sample_rate,
        channels=decoded.channels,
        bitrate=None,
        format=fmt,
        file_hash_sha256=sha256,
        file_size_bytes=len(data),
        file_path=str(blob_path),
        chromaprint_fingerprint=content_fp.encode_fingerprint(cfp) if len(cfp) else None,
        chromaprint_duration=decoded.duration_seconds,
        fp_indexed=1,
        embedding_model=settings.embedding_model if n_chunks else None,
        embedding_dim=settings.embedding_dim if n_chunks else None,
    )
    logger.info(
        "ingested %s as %s (%d hashes, %d chunks)",
        filename, track_id, n_hashes, n_chunks,
    )
    return IngestOutcome(status="ingested", track=track)


async def _reindex_existing(
    data: bytes,
    existing: TrackRow,
    *,
    settings: Settings,
    catalog: Catalog,
    engine: EngineState,
) -> IngestOutcome:
    """Re-derive fingerprint + embeddings for a track that already has a
    catalog row (rebuild-index path).  Metadata, uuid, and the blob are
    kept; only derived state is recomputed — e.g. after a fingerprint
    FORMAT_VERSION bump."""
    try:
        decoded = await audio_io.decode_audio(data, existing.format)
    except audio_io.DecodeError as e:
        return IngestOutcome(
            status="error", error_code="UNSUPPORTED_FORMAT",
            error_message=f"Failed to decode audio: {e}",
        )
    pcm_16k = await asyncio.to_thread(resample_to_16k, decoded.pcm, decoded.sample_rate)
    try:
        await engine.fingerprint_and_index(existing.id, pcm_16k)
    except Exception as e:  # noqa: BLE001 — map engine failure to pipeline error
        logger.exception("re-index failed for %s", existing.id)
        return IngestOutcome(
            status="error", error_code="SERVICE_UNAVAILABLE",
            error_message=f"Fingerprint indexing failed: {e}",
        )
    n_chunks = 0
    if engine.vibe_enabled:
        pcm_48k = await asyncio.to_thread(
            resample_to_48k, decoded.pcm, decoded.sample_rate
        )
        try:
            n_chunks = await engine.embed_and_store(existing.id, pcm_48k)
        except Exception:  # noqa: BLE001 — vibe failure degrades, not fatal
            logger.exception("chunk embedding failed for %s", existing.id)
    await catalog.a_update_track(
        existing.id,
        fp_indexed=1,
        embedding_model=settings.embedding_model if n_chunks else None,
        embedding_dim=settings.embedding_dim if n_chunks else None,
    )
    logger.info("re-indexed %s (%s)", existing.id, existing.title)
    return IngestOutcome(status="ingested", track=existing)


def _write_blob(path: Path, data: bytes) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)


async def ingest_directory(
    directory: str | Path,
    *,
    settings: Settings,
    catalog: Catalog,
    engine: EngineState,
    rebind_existing: bool = False,
) -> BatchReport:
    """Sequential batch ingestion of a server-side directory."""
    root = Path(directory)
    files = sorted(
        p for p in root.rglob("*") if p.suffix.lower() in AUDIO_EXTENSIONS
    )
    report = BatchReport(total=len(files))
    engine.defer_rewarm = True  # one re-warm at the end, not per capacity crossing
    for p in files:
        try:
            data = await asyncio.to_thread(p.read_bytes)
            outcome = await ingest_bytes(
                data, p.name, settings=settings, catalog=catalog, engine=engine,
                rebind_existing=rebind_existing,
            )
        except Exception as e:  # noqa: BLE001 — batch isolates per-file failures
            logger.exception("ingest failed for %s", p)
            report.errors.append((str(p), str(e)))
            continue
        if outcome.status == "ingested":
            report.ingested += 1
        elif outcome.status == "duplicate":
            report.duplicates += 1
        else:
            report.errors.append((str(p), outcome.error_message or "unknown error"))
    engine.defer_rewarm = False
    await asyncio.get_running_loop().run_in_executor(
        engine._tpu, engine._rewarm_if_grown
    )
    await engine.snapshot()
    return report

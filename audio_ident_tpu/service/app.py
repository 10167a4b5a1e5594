"""Service app factory: routes, validation, startup/shutdown.

Mirrors the reference's FastAPI app + routers (reference:
audio-ident-service/app/main.py:48-188, app/routers/*) over the local mini
ASGI framework.  Route-by-route parity with docs/api-contract.md v1.2.0:
/health, /api/v1/version, /api/v1/search, /api/v1/ingest, /api/v1/tracks,
/api/v1/tracks/{id}, /api/v1/tracks/{id}/audio.
"""

from __future__ import annotations

import asyncio
import logging
import subprocess
import uuid as uuidlib
from pathlib import Path

from audio_ident_tpu.service import audio as audio_io
from audio_ident_tpu.service import ingest as ingest_mod
from audio_ident_tpu.service.auth import require_admin_key
from audio_ident_tpu.service.catalog import Catalog, TrackRow
from audio_ident_tpu.service.http import (
    App,
    FileResponse,
    HttpError,
    JSONResponse,
    Request,
    Response,
)
from audio_ident_tpu.service.orchestrator import (
    SearchTimeoutError,
    SearchUnavailableError,
    orchestrate_search,
)
from audio_ident_tpu.service.schemas import (
    ExactMatch,
    HealthResponse,
    IngestError,
    IngestReport,
    IngestResponse,
    IngestStatus,
    PaginatedResponse,
    PaginationMeta,
    SearchMode,
    StreamCreateResponse,
    StreamMatch,
    StreamPushResponse,
    TrackDetail,
    TrackInfo,
    VersionResponse,
    VibeMatch,
)
from audio_ident_tpu.service.settings import Settings, load_settings
from audio_ident_tpu.service.state import (
    EngineState,
    resample_to_16k,
    resample_to_48k,
)

logger = logging.getLogger(__name__)

SEARCH_MIN_DURATION_SEC = 3.0


def _track_info(row: TrackRow) -> TrackInfo:
    return TrackInfo(
        id=row.id,
        title=row.title,
        artist=row.artist,
        album=row.album,
        duration_seconds=row.duration_seconds,
        ingested_at=row.ingested_at,
    )


def _git_sha() -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, timeout=2, text=True,
        )
        return out.stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        return None


def create_app(
    settings: Settings | None = None,
    *,
    catalog: Catalog | None = None,
    engine: EngineState | None = None,
) -> App:
    settings = settings or load_settings()
    app = App(cors_origins=settings.cors_origins)
    catalog = catalog or Catalog(settings.catalog_file)
    if engine is None:
        from audio_ident_tpu.service.state import load_vibe_lane

        vibe_lane = None
        try:
            vibe_lane = load_vibe_lane(
                settings.clap_checkpoint, random_init=settings.clap_random_init
            )
        except Exception:  # noqa: BLE001 — CLAP load failure degrades to
            # exact-only, mirroring the reference (app/main.py:124-127)
            logger.exception("CLAP load failed; vibe lane disabled")
        engine = EngineState(
            max_tracks=settings.max_tracks,
            index_dir=settings.index_dir,
            compile_cache_dir=Path(settings.compile_cache).expanduser(),
            vibe_lane=vibe_lane,
            vector_dir=settings.vector_dir,
            mesh_shards=settings.mesh_shards,
            wal_fsync=settings.wal_fsync,
            compact_delta_postings=settings.compact_delta_postings,
            vector_quant=settings.vector_quant,
        )
    audio_io.ensure_storage_dirs(settings.storage_root)
    app.state.update(settings=settings, catalog=catalog, engine=engine)
    ingest_lock = asyncio.Lock()

    async def _startup() -> None:
        try:
            await engine.warmup()
        except Exception:  # noqa: BLE001 — warm-up failure must not kill boot
            logger.exception("engine warm-up failed")
        if settings.micro_batch:
            # co-batched request shapes compile off the serving path
            engine.start_micro_batch_warm()

    async def _shutdown() -> None:
        await engine.snapshot()
        await engine.close()
        catalog.close()

    app.on_startup.append(_startup)
    app.on_shutdown.append(_shutdown)

    # -- static UI (the reference serves a SvelteKit app on its own port;
    #    ours is a dependency-free static bundle served in-process) ----------

    ui_root = Path(__file__).resolve().parent.parent.parent / "ui"
    ui_types = {".html": "text/html", ".js": "text/javascript", ".css": "text/css"}

    @app.get("/")
    async def root(_request: Request):
        return Response(
            b"", 307, {"location": "/ui/", "content-type": "text/plain"}
        )

    @app.get("/ui/")
    @app.get("/ui/{asset}")
    async def ui_asset(request: Request):
        name = request.path_params.get("asset") or "index.html"
        path = (ui_root / name).resolve()
        if not str(path).startswith(str(ui_root)) or not path.is_file():
            raise HttpError(404, "NOT_FOUND", f"no such asset: {name}")
        media = ui_types.get(path.suffix, "application/octet-stream")
        return FileResponse(str(path), media)

    # -- openapi (reference: auto-generated by FastAPI at /openapi.json) -------

    @app.get("/openapi.json")
    async def openapi(_request: Request):
        from audio_ident_tpu.service.openapi import build_spec

        return JSONResponse(
            build_spec(settings.service_name, settings.service_version)
        )

    # -- health / version (reference: app/routers/health.py, version.py) -------

    @app.get("/health")
    async def health(_request: Request):
        return JSONResponse(
            HealthResponse(status="ok", version=settings.service_version)
        )

    @app.get("/api/v1/version")
    async def version(_request: Request):
        import os

        return JSONResponse(
            VersionResponse(
                name=settings.service_name,
                version=settings.service_version,
                git_sha=_git_sha(),
                build_time=os.environ.get("BUILD_TIME"),
            )
        )

    # -- search (reference: app/routers/search.py:28-212) ----------------------

    @app.post("/api/v1/search")
    async def search(request: Request):
        form = request.form()
        part = form.file("audio")
        if part is None:
            raise HttpError(400, "VALIDATION_ERROR", "missing 'audio' file field")
        if len(part.data) > settings.max_search_upload_bytes:
            raise HttpError(
                400, "FILE_TOO_LARGE",
                f"File exceeds {settings.max_search_upload_bytes // (1024*1024)} MB limit",
            )
        sniffed = audio_io.sniff_format(part.data)
        if sniffed is None:
            raise HttpError(
                400, "UNSUPPORTED_FORMAT",
                "Audio format not recognized. Supported: MP3, WAV, FLAC, OGG, WebM, MP4.",
            )
        fmt, _ = sniffed

        mode_raw = form.value("mode") or "both"
        try:
            mode = SearchMode(mode_raw)
        except ValueError:
            raise HttpError(400, "VALIDATION_ERROR", f"invalid mode {mode_raw!r}") from None
        max_results_raw = form.value("max_results") or "10"
        try:
            max_results = max(1, min(int(max_results_raw), 50))
        except ValueError:
            raise HttpError(400, "VALIDATION_ERROR", "max_results must be an integer") from None

        try:
            decoded = await audio_io.decode_audio(part.data, fmt)
        except audio_io.DecodeError as e:
            raise HttpError(400, "UNSUPPORTED_FORMAT", f"Failed to decode audio: {e}") from e
        if decoded.duration_seconds < SEARCH_MIN_DURATION_SEC:
            raise HttpError(
                400, "AUDIO_TOO_SHORT",
                f"Audio clip is {decoded.duration_seconds:.1f}s; minimum is 3s",
            )

        if mode is SearchMode.BOTH and not engine.vibe_enabled:
            mode = SearchMode.EXACT  # degrade (reference: search.py:184-186)

        pcm_16k = await asyncio.to_thread(
            resample_to_16k, decoded.pcm, decoded.sample_rate
        )

        async def exact_lane() -> list[ExactMatch]:
            candidates = await engine.exact_search(pcm_16k, max_results)
            rows = {}
            ids = []
            for c in candidates:
                tid = engine.fp_index.uuid_of(c.track_row)
                if tid is not None:
                    ids.append(tid)
                    rows[c.track_row] = tid
            meta = await catalog.a_get_tracks(ids)
            out = []
            for c in candidates:
                tid = rows.get(c.track_row)
                if tid is None or tid not in meta:
                    continue
                out.append(
                    ExactMatch(
                        track=_track_info(meta[tid]),
                        confidence=c.confidence,
                        offset_seconds=round(c.offset_seconds, 3),
                        aligned_hashes=c.aligned_hashes,
                        low_confidence=c.low_confidence,
                    )
                )
            return out

        vibe_lane = None
        if engine.vibe_enabled and mode in (SearchMode.VIBE, SearchMode.BOTH):

            async def vibe_lane() -> list[VibeMatch]:
                pcm_48k = await asyncio.to_thread(
                    resample_to_48k, decoded.pcm, decoded.sample_rate
                )
                scores = await engine.vibe_search(pcm_48k)
                scores = scores[:max_results]
                ids = [
                    tid
                    for s in scores
                    if (tid := engine.fp_index.uuid_of(s.track_row)) is not None
                ]
                meta = await catalog.a_get_tracks(ids)
                out = []
                for s in scores:
                    tid = engine.fp_index.uuid_of(s.track_row)
                    if tid is None or tid not in meta:
                        continue
                    out.append(
                        VibeMatch(
                            track=_track_info(meta[tid]),
                            similarity=round(s.final_score, 4),
                            embedding_model=settings.embedding_model,
                        )
                    )
                return out

        try:
            response = await orchestrate_search(
                mode,
                exact_lane if mode in (SearchMode.EXACT, SearchMode.BOTH) else None,
                vibe_lane,
                exact_timeout=settings.exact_timeout_sec,
                vibe_timeout=settings.vibe_timeout_sec,
            )
        except SearchTimeoutError as e:
            raise HttpError(504, "SEARCH_TIMEOUT", str(e)) from e
        except SearchUnavailableError as e:
            raise HttpError(503, "SERVICE_UNAVAILABLE", str(e)) from e
        return JSONResponse(response)

    # -- ingest (reference: app/routers/ingest.py:35-214) ----------------------

    @app.post("/api/v1/ingest")
    async def ingest(request: Request):
        require_admin_key(request, settings.admin_api_key)
        form = request.form()
        part = form.file("audio")
        directory = form.value("directory")
        if (part is None) == (directory is None):
            raise HttpError(
                400, "VALIDATION_ERROR",
                "Exactly one of 'audio' or 'directory' must be provided",
            )

        # TOCTOU-safe: check + acquire with no await between
        # (reference: routers/ingest.py:149-161)
        if ingest_lock.locked():
            raise HttpError(
                429, "RATE_LIMITED",
                "Another ingestion is in progress. Please try again in a moment.",
            )
        async with ingest_lock:
            if directory is not None:
                dpath = Path(directory)
                if not dpath.is_dir():
                    raise HttpError(
                        400, "DIRECTORY_NOT_FOUND", f"No such directory: {directory}"
                    )
                report = await ingest_mod.ingest_directory(
                    dpath, settings=settings, catalog=catalog, engine=engine
                )
                return JSONResponse(
                    IngestReport(
                        total=report.total,
                        ingested=report.ingested,
                        duplicates=report.duplicates,
                        errors=[IngestError(file=f, error=e) for f, e in report.errors],
                    )
                )

            if len(part.data) > settings.max_ingest_upload_bytes:
                raise HttpError(
                    400, "FILE_TOO_LARGE",
                    f"File exceeds {settings.max_ingest_upload_bytes // (1024*1024)} MB limit",
                )
            outcome = await ingest_mod.ingest_bytes(
                part.data, part.filename or "upload",
                settings=settings, catalog=catalog, engine=engine,
            )

        if outcome.status == "error":
            status = 503 if outcome.error_code == "SERVICE_UNAVAILABLE" else 400
            raise HttpError(
                status, outcome.error_code or "INTERNAL_ERROR",
                outcome.error_message or "Unknown error",
            )
        assert outcome.track is not None
        return JSONResponse(
            IngestResponse(
                track_id=outcome.track.id,
                title=outcome.track.title,
                artist=outcome.track.artist,
                status=IngestStatus(outcome.status),
            ),
            status=201 if outcome.status == "ingested" else 200,
        )

    # -- streaming identification (BASELINE config #3; no reference
    #    counterpart — the reference's long-context handling is offline
    #    chunking only, SURVEY.md §5) ------------------------------------------
    #
    # Session-based chunked HTTP: POST /stream opens a session, raw
    # s16le/f32le PCM chunks feed /stream/{id}/audio, every push returns
    # the live verdict, DELETE closes.  Works over plain HTTP (the mini
    # ASGI server has no websocket layer; chunk-per-request keeps the
    # same testability as every other endpoint).

    streams: dict[str, tuple[object, float]] = {}

    def _gc_streams(now: float) -> None:
        dead = [
            sid for sid, (_, last) in streams.items()
            if now - last > settings.stream_idle_timeout_sec
        ]
        for sid in dead:
            del streams[sid]

    @app.post("/api/v1/stream")
    async def stream_create(_request: Request):
        import time as time_mod

        from audio_ident_tpu.search import streaming as streaming_mod

        now = time_mod.monotonic()
        _gc_streams(now)
        if len(streams) >= settings.max_streams:
            raise HttpError(
                429, "RATE_LIMITED",
                f"Too many concurrent streams (max {settings.max_streams})",
            )
        sid = str(uuidlib.uuid4())
        streams[sid] = (engine.create_stream(), now)
        return JSONResponse(
            StreamCreateResponse(
                stream_id=sid,
                pcm_format="pcm_s16le",
                sample_rate=16000,
                window_sec=streaming_mod.STREAM_WINDOW_SEC,
                hop_sec=streaming_mod.STREAM_HOP_SEC,
            ),
            status=201,
        )

    @app.post("/api/v1/stream/{stream_id}/audio")
    async def stream_push(request: Request):
        import time as time_mod

        import numpy as np

        sid = request.path_params["stream_id"]
        entry = streams.get(sid)
        if entry is None:
            raise HttpError(404, "NOT_FOUND", f"no such stream: {sid}")
        ident, _ = entry
        body = request.body
        if not body:
            raise HttpError(400, "VALIDATION_ERROR", "empty audio chunk")
        if len(body) > 2 * 16000 * 30:  # 30 s of s16le per push is plenty
            raise HttpError(400, "FILE_TOO_LARGE", "chunk exceeds 30 s of PCM")
        ctype = request.headers.get("content-type", "application/octet-stream")
        if "f32" in ctype or "float" in ctype:
            if len(body) % 4:
                raise HttpError(400, "VALIDATION_ERROR", "truncated f32le chunk")
            pcm = np.frombuffer(body, np.float32).astype(np.float32)
        else:
            if len(body) % 2:
                raise HttpError(400, "VALIDATION_ERROR", "truncated s16le chunk")
            pcm = np.frombuffer(body, np.int16).astype(np.float32) / 32768.0

        report = await engine.stream_push(ident, pcm)
        streams[sid] = (ident, time_mod.monotonic())
        match = None
        if report is not None:
            tid = engine.fp_index.uuid_of(report.track_row)
            meta = await catalog.a_get_tracks([tid] if tid else [])
            if tid is not None and tid in meta:
                match = StreamMatch(
                    track=_track_info(meta[tid]),
                    carried_score=report.carried_score,
                    confidence=round(report.confidence, 4),
                    offset_seconds=round(report.offset_seconds, 3),
                    stream_position_sec=round(report.stream_position_sec, 3),
                )
        return JSONResponse(
            StreamPushResponse(
                stream_id=sid,
                position_sec=round(ident.position_sec, 3),
                confirmed=match is not None,
                match=match,
            )
        )

    @app.delete("/api/v1/stream/{stream_id}")
    async def stream_close(request: Request):
        sid = request.path_params["stream_id"]
        if streams.pop(sid, None) is None:
            raise HttpError(404, "NOT_FOUND", f"no such stream: {sid}")
        return Response(b"", 204, {"content-type": "text/plain"})

    # -- debug: recent engine spans (admin-gated; SURVEY.md §5 tracing) --------

    @app.get("/api/v1/debug/spans")
    async def debug_spans(request: Request):
        require_admin_key(request, settings.admin_api_key)
        from audio_ident_tpu.utils.profiling import recent_spans

        return JSONResponse({"spans": recent_spans()})

    # -- tracks (reference: app/routers/tracks.py:63-266) ----------------------

    @app.get("/api/v1/tracks")
    async def list_tracks(request: Request):
        try:
            page = int(request.query.get("page", "1"))
            page_size = int(request.query.get("pageSize", "50"))
        except ValueError:
            raise HttpError(400, "VALIDATION_ERROR", "page/pageSize must be integers") from None
        search_q = request.query.get("search") or None
        page = max(page, 1)
        page_size = min(max(page_size, 1), 100)
        rows, total = await catalog.a_list_tracks(page, page_size, search_q)
        total_pages = max((total + page_size - 1) // page_size, 1)
        return JSONResponse(
            PaginatedResponse[TrackInfo](
                data=[_track_info(r) for r in rows],
                pagination=PaginationMeta(
                    page=page, pageSize=page_size,
                    totalItems=total, totalPages=total_pages,
                ),
            )
        )

    def _parse_track_id(raw: str) -> str:
        try:
            return str(uuidlib.UUID(raw))
        except ValueError:
            raise HttpError(400, "VALIDATION_ERROR", f"invalid UUID: {raw}") from None

    @app.get("/api/v1/tracks/{track_id}")
    async def track_detail(request: Request):
        tid = _parse_track_id(request.path_params["track_id"])
        row = await catalog.a_get_track(tid)
        if row is None:
            raise HttpError(404, "NOT_FOUND", f"track {tid} not found")
        return JSONResponse(
            TrackDetail(
                **_track_info(row).model_dump(),
                sample_rate=row.sample_rate,
                channels=row.channels,
                bitrate=row.bitrate,
                format=row.format,
                file_hash_sha256=row.file_hash_sha256,
                file_size_bytes=row.file_size_bytes,
                olaf_indexed=row.fp_indexed,
                embedding_model=row.embedding_model,
                embedding_dim=row.embedding_dim,
                updated_at=row.updated_at,
            )
        )

    @app.delete("/api/v1/tracks/{track_id}")
    async def delete_track(request: Request):
        """Admin: tombstone a track everywhere (fingerprints, vectors,
        catalog).  The raw blob stays — it is the rebuild source of truth.
        The reference implements engine-level delete (olaf_delete_track,
        delete_track_embeddings) but never exposed a route; this completes
        the surface."""
        require_admin_key(request, settings.admin_api_key)
        tid = _parse_track_id(request.path_params["track_id"])
        row = await catalog.a_get_track(tid)
        if row is None:
            raise HttpError(404, "NOT_FOUND", f"track {tid} not found")
        await engine.delete_track(tid)
        await catalog.a_delete_track(tid)
        return Response(b"", 204, {"content-type": "text/plain"})

    @app.get("/api/v1/tracks/{track_id}/audio")
    async def track_audio(request: Request):
        tid = _parse_track_id(request.path_params["track_id"])
        row = await catalog.a_get_track(tid)
        if row is None:
            raise HttpError(404, "NOT_FOUND", f"track {tid} not found")
        fmt = row.format or Path(row.file_path).suffix.lstrip(".") or "bin"
        # Reconstruct from hash, never trust the stored path blindly
        # (reference traversal guard: app/routers/tracks.py:227-244)
        path = audio_io.raw_audio_path(settings.storage_root, row.file_hash_sha256, fmt)
        resolved = path.resolve()
        root = settings.storage_root.resolve()
        if not str(resolved).startswith(str(root)):
            raise HttpError(404, "FILE_NOT_FOUND", "audio file path is invalid")
        if not resolved.is_file():
            raise HttpError(404, "FILE_NOT_FOUND", "audio file missing from storage")
        media = audio_io.MIME_BY_FORMAT.get(fmt, "application/octet-stream")
        return FileResponse(
            str(resolved), media, range_header=request.headers.get("range")
        )

    return app

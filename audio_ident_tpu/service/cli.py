"""Admin CLI: batch ingestion + index rebuild from the raw blob store.

Mirrors the reference's batch CLI (``python -m app.ingest <dir>``,
reference: audio-ident-service/app/ingest/cli.py:17-74) and its
``make rebuild-index`` recovery path (drop derived stores, re-derive from
``raw/``, reference: Makefile:96-107) — the raw blob store is the source
of truth; fingerprint and vector indexes are derived state.

Usage:
    python -m audio_ident_tpu.service.cli ingest <directory>
    python -m audio_ident_tpu.service.cli rebuild-index
    python -m audio_ident_tpu.service.cli snapshot
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import shutil
import sys
from pathlib import Path

logger = logging.getLogger(__name__)


def _build_state(settings):
    from audio_ident_tpu.service.catalog import Catalog
    from audio_ident_tpu.service.state import EngineState, load_vibe_lane

    vibe_lane = None
    try:
        vibe_lane = load_vibe_lane(
            settings.clap_checkpoint, random_init=settings.clap_random_init
        )
    except Exception:  # noqa: BLE001 — degrade to exact-only
        logger.exception("CLAP load failed; ingesting without embeddings")
    catalog = Catalog(settings.catalog_file)
    engine = EngineState(
        max_tracks=settings.max_tracks,
        index_dir=settings.index_dir,
        compile_cache_dir=Path(settings.compile_cache).expanduser(),
        vibe_lane=vibe_lane,
        vector_dir=settings.vector_dir,
    )
    return catalog, engine


async def _run_ingest(settings, directory: Path, rebind_existing: bool = False) -> int:
    from audio_ident_tpu.service.ingest import ingest_directory

    catalog, engine = _build_state(settings)
    report = await ingest_directory(
        directory, settings=settings, catalog=catalog, engine=engine,
        rebind_existing=rebind_existing,
    )
    print(
        f"total={report.total} ingested={report.ingested} "
        f"duplicates={report.duplicates} errors={len(report.errors)}"
    )
    for f, e in report.errors:
        print(f"  ERROR {f}: {e}")
    # leave the store in its serving-optimal state: everything merged into
    # the main CSR (wide strided fanout) and snapshotted (the r2 eval index
    # was left 100% delta — fanout-8 probing degraded recall; verdict #2)
    merged = await engine.compact()
    if merged:
        print(f"compacted {merged} delta postings into the main CSR")
    await engine.snapshot()
    print(f"snapshot written: {settings.index_dir}")
    await engine.close()
    catalog.close()
    return 0 if not report.errors else 1


async def _run_rebuild(settings) -> int:
    """Drop DERIVED indexes and re-ingest from raw/.

    The catalog is source-of-truth metadata and is PRESERVED: each raw blob
    whose hash already has a catalog row is re-indexed under that row (same
    uuid/title/artist), so a rebuild — e.g. after a fingerprint
    FORMAT_VERSION bump — never loses track identity (reference:
    Makefile:96-107 re-derives only the fingerprint/vector stores)."""
    raw = settings.storage_root / "raw"
    if not raw.is_dir():
        print(f"no raw blob store at {raw}", file=sys.stderr)
        return 1
    for derived in (settings.index_dir, settings.vector_dir):
        if Path(derived).exists():
            shutil.rmtree(derived)
            print(f"dropped {derived}")
    return await _run_ingest(settings, raw, rebind_existing=True)


async def _run_snapshot(settings) -> int:
    catalog, engine = _build_state(settings)
    await engine.snapshot()
    print(f"snapshot written: {settings.index_dir}")
    await engine.close()
    catalog.close()
    return 0


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    from audio_ident_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(prog="audio-ident-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_ingest = sub.add_parser("ingest", help="batch-ingest a directory")
    p_ingest.add_argument("directory", type=Path)
    sub.add_parser("rebuild-index", help="re-derive all indexes from raw/")
    sub.add_parser("snapshot", help="write index snapshots to disk")
    args = parser.parse_args(argv)

    from audio_ident_tpu.service.settings import load_settings

    settings = load_settings()
    if args.cmd == "ingest":
        return asyncio.run(_run_ingest(settings, args.directory))
    if args.cmd == "rebuild-index":
        return asyncio.run(_run_rebuild(settings))
    return asyncio.run(_run_snapshot(settings))


if __name__ == "__main__":
    raise SystemExit(main())

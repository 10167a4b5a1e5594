"""Track metadata catalog over sqlite3 (stdlib) with async access.

Mirrors the reference's PostgreSQL ``tracks`` table (reference:
audio-ident-service/app/models/track.py:11-57) and its migration story
(alembic versions) with a stdlib sqlite backend + an in-file migration
ladder — this environment ships no SQLAlchemy/asyncpg, and a single-writer
service doesn't need more.  All calls run in a thread via
``asyncio.to_thread`` so the event loop never blocks on I/O.
"""

from __future__ import annotations

import asyncio
import sqlite3
import threading
import uuid as uuidlib
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path

MIGRATIONS: list[str] = [
    # v1: tracks table (columns mirror reference alembic 43aa2e7ecfe9 + b96f382d0813)
    """
    CREATE TABLE tracks (
        id TEXT PRIMARY KEY,
        title TEXT NOT NULL,
        artist TEXT,
        album TEXT,
        duration_seconds REAL NOT NULL,
        sample_rate INTEGER,
        channels INTEGER,
        bitrate INTEGER,
        format TEXT,
        file_hash_sha256 TEXT NOT NULL UNIQUE,
        file_size_bytes INTEGER NOT NULL,
        file_path TEXT NOT NULL,
        chromaprint_fingerprint TEXT,
        chromaprint_duration REAL,
        fp_indexed INTEGER NOT NULL DEFAULT 0,
        embedding_model TEXT,
        embedding_dim INTEGER,
        ingested_at TEXT NOT NULL,
        updated_at TEXT NOT NULL
    );
    CREATE INDEX ix_tracks_artist_title ON tracks (artist, title);
    CREATE INDEX ix_tracks_ingested_at ON tracks (ingested_at);
    """,
]


@dataclass
class TrackRow:
    id: str
    title: str
    artist: str | None
    album: str | None
    duration_seconds: float
    sample_rate: int | None
    channels: int | None
    bitrate: int | None
    format: str | None
    file_hash_sha256: str
    file_size_bytes: int
    file_path: str
    chromaprint_fingerprint: str | None
    chromaprint_duration: float | None
    fp_indexed: bool
    embedding_model: str | None
    embedding_dim: int | None
    ingested_at: datetime
    updated_at: datetime


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


def _row_to_track(r: sqlite3.Row) -> TrackRow:
    return TrackRow(
        id=r["id"],
        title=r["title"],
        artist=r["artist"],
        album=r["album"],
        duration_seconds=r["duration_seconds"],
        sample_rate=r["sample_rate"],
        channels=r["channels"],
        bitrate=r["bitrate"],
        format=r["format"],
        file_hash_sha256=r["file_hash_sha256"],
        file_size_bytes=r["file_size_bytes"],
        file_path=r["file_path"],
        chromaprint_fingerprint=r["chromaprint_fingerprint"],
        chromaprint_duration=r["chromaprint_duration"],
        fp_indexed=bool(r["fp_indexed"]),
        embedding_model=r["embedding_model"],
        embedding_dim=r["embedding_dim"],
        ingested_at=datetime.fromisoformat(r["ingested_at"]),
        updated_at=datetime.fromisoformat(r["updated_at"]),
    )


_LIKE_ESCAPE = str.maketrans({"%": r"\%", "_": r"\_", "\\": "\\\\"})


class Catalog:
    """Synchronous core + async wrappers (``a``-prefixed methods)."""

    def __init__(self, path: str | Path = ":memory:"):
        if path != ":memory:":
            Path(path).parent.mkdir(parents=True, exist_ok=True)
        self._conn = sqlite3.connect(str(path), check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._conn.execute("PRAGMA journal_mode=WAL")
        self._conn.execute("PRAGMA foreign_keys=ON")
        self._lock = threading.Lock()
        self._migrate()

    def _migrate(self) -> None:
        cur = self._conn.execute("PRAGMA user_version")
        version = cur.fetchone()[0]
        for i in range(version, len(MIGRATIONS)):
            with self._conn:
                self._conn.executescript(MIGRATIONS[i])
                self._conn.execute(f"PRAGMA user_version = {i + 1}")

    def close(self) -> None:
        self._conn.close()

    # -- writes ----------------------------------------------------------------

    def insert_track(self, **fields) -> TrackRow:
        fields.setdefault("id", str(uuidlib.uuid4()))
        now = _now()
        fields.setdefault("ingested_at", now)
        fields.setdefault("updated_at", now)
        cols = ", ".join(fields)
        ph = ", ".join("?" for _ in fields)
        with self._lock, self._conn:
            self._conn.execute(
                f"INSERT INTO tracks ({cols}) VALUES ({ph})", list(fields.values())
            )
        row = self.get_track(fields["id"])
        assert row is not None
        return row

    def update_track(self, track_id: str, **fields) -> None:
        fields["updated_at"] = _now()
        sets = ", ".join(f"{k} = ?" for k in fields)
        with self._lock, self._conn:
            self._conn.execute(
                f"UPDATE tracks SET {sets} WHERE id = ?",
                [*fields.values(), track_id],
            )

    def delete_track(self, track_id: str) -> bool:
        with self._lock, self._conn:
            cur = self._conn.execute("DELETE FROM tracks WHERE id = ?", (track_id,))
            return cur.rowcount > 0

    # -- reads -------------------------------------------------------------------

    def get_track(self, track_id: str) -> TrackRow | None:
        cur = self._conn.execute("SELECT * FROM tracks WHERE id = ?", (track_id,))
        r = cur.fetchone()
        return _row_to_track(r) if r else None

    def get_tracks(self, track_ids: list[str]) -> dict[str, TrackRow]:
        if not track_ids:
            return {}
        ph = ", ".join("?" for _ in track_ids)
        cur = self._conn.execute(
            f"SELECT * FROM tracks WHERE id IN ({ph})", track_ids
        )
        return {r["id"]: _row_to_track(r) for r in cur.fetchall()}

    def find_by_hash(self, sha256: str) -> TrackRow | None:
        cur = self._conn.execute(
            "SELECT * FROM tracks WHERE file_hash_sha256 = ?", (sha256,)
        )
        r = cur.fetchone()
        return _row_to_track(r) if r else None

    def find_near_duration(self, duration: float, tolerance_frac: float = 0.10) -> list[TrackRow]:
        """Chromaprint dedup candidates within ±tolerance of the duration
        (reference: app/audio/dedup.py:170-191)."""
        lo = duration * (1 - tolerance_frac)
        hi = duration * (1 + tolerance_frac)
        cur = self._conn.execute(
            "SELECT * FROM tracks WHERE duration_seconds BETWEEN ? AND ?"
            " AND chromaprint_fingerprint IS NOT NULL",
            (lo, hi),
        )
        return [_row_to_track(r) for r in cur.fetchall()]

    def list_tracks(
        self, page: int = 1, page_size: int = 50, search: str | None = None
    ) -> tuple[list[TrackRow], int]:
        """Paginated listing with %/_-escaped substring search
        (reference: app/routers/tracks.py:76-90)."""
        page = max(page, 1)
        page_size = min(max(page_size, 1), 100)
        where, params = "", []
        if search:
            esc = search.translate(_LIKE_ESCAPE)
            where = (
                r"WHERE title LIKE ? ESCAPE '\' OR artist LIKE ? ESCAPE '\'"
            )
            params = [f"%{esc}%", f"%{esc}%"]
        total = self._conn.execute(
            f"SELECT COUNT(*) FROM tracks {where}", params
        ).fetchone()[0]
        cur = self._conn.execute(
            f"SELECT * FROM tracks {where} ORDER BY ingested_at DESC, id"
            " LIMIT ? OFFSET ?",
            [*params, page_size, (page - 1) * page_size],
        )
        return [_row_to_track(r) for r in cur.fetchall()], total

    def count(self) -> int:
        return self._conn.execute("SELECT COUNT(*) FROM tracks").fetchone()[0]

    def all_fp_indexed_ids(self) -> list[str]:
        cur = self._conn.execute("SELECT id FROM tracks WHERE fp_indexed = 1")
        return [r["id"] for r in cur.fetchall()]

    # -- async wrappers -----------------------------------------------------------

    async def a_insert_track(self, **fields) -> TrackRow:
        return await asyncio.to_thread(self.insert_track, **fields)

    async def a_update_track(self, track_id: str, **fields) -> None:
        await asyncio.to_thread(self.update_track, track_id, **fields)

    async def a_get_track(self, track_id: str) -> TrackRow | None:
        return await asyncio.to_thread(self.get_track, track_id)

    async def a_get_tracks(self, track_ids: list[str]) -> dict[str, TrackRow]:
        return await asyncio.to_thread(self.get_tracks, track_ids)

    async def a_find_by_hash(self, sha256: str) -> TrackRow | None:
        return await asyncio.to_thread(self.find_by_hash, sha256)

    async def a_find_near_duration(self, duration: float, tolerance_frac: float = 0.10):
        return await asyncio.to_thread(self.find_near_duration, duration, tolerance_frac)

    async def a_list_tracks(self, page: int = 1, page_size: int = 50, search: str | None = None):
        return await asyncio.to_thread(self.list_tracks, page, page_size, search)

    async def a_delete_track(self, track_id: str) -> bool:
        return await asyncio.to_thread(self.delete_track, track_id)

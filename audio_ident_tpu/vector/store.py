"""Host-side embedding store: source of truth + snapshot/restore.

Mirrors the information content of the reference's Qdrant collection
(512-d cosine vectors + payload track_id/chunk_index/offset_sec,
reference: app/audio/qdrant_setup.py:85-160) as plain NumPy arrays keyed
by the SAME internal track rows as the fingerprint index (one shared
uuid<->row registry; tombstones live there too).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1


class VectorStore:
    """Append-mostly embedding matrix with per-track delete."""

    def __init__(self, dim: int = 512):
        self.dim = dim
        self.embeddings = np.zeros((0, dim), dtype=np.float32)
        self.track = np.zeros(0, dtype=np.int32)
        self.offset_sec = np.zeros(0, dtype=np.float32)
        self.chunk_index = np.zeros(0, dtype=np.int32)
        self._pending: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
        self.version = 0

    @property
    def num_chunks(self) -> int:
        return len(self.track) + sum(len(p[1]) for p in self._pending)

    def add_track(
        self,
        track_row: int,
        embeddings: np.ndarray,
        offsets_sec: np.ndarray,
    ) -> None:
        """Queue unit-norm chunk embeddings for a track row."""
        e = np.asarray(embeddings, dtype=np.float32)
        if e.ndim != 2 or e.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] embeddings, got {e.shape}")
        n = len(e)
        self._pending.append(
            (
                e,
                np.full(n, track_row, dtype=np.int32),
                np.asarray(offsets_sec, dtype=np.float32),
                np.arange(n, dtype=np.int32),
            )
        )
        self.version += 1

    def delete_track(self, track_row: int) -> int:
        """Drop a track's chunks immediately (cheap: boolean compaction)."""
        self.flush()
        keep = self.track != track_row
        removed = int((~keep).sum())
        if removed:
            self.embeddings = self.embeddings[keep]
            self.track = self.track[keep]
            self.offset_sec = self.offset_sec[keep]
            self.chunk_index = self.chunk_index[keep]
            self.version += 1
        return removed

    def flush(self) -> None:
        if not self._pending:
            return
        self.embeddings = np.concatenate([self.embeddings] + [p[0] for p in self._pending])
        self.track = np.concatenate([self.track] + [p[1] for p in self._pending])
        self.offset_sec = np.concatenate([self.offset_sec] + [p[2] for p in self._pending])
        self.chunk_index = np.concatenate([self.chunk_index] + [p[3] for p in self._pending])
        self._pending.clear()

    def rows_present(self) -> set[int]:
        """Track rows that already have stored chunks (WAL-replay dedup)."""
        rows = set(np.unique(self.track).tolist())
        for p in self._pending:
            if len(p[1]):
                rows.add(int(p[1][0]))
        return rows

    # -- durability ------------------------------------------------------------
    # Atomic snapshot: arrays stream through snapio (zstd + tmp-file rename);
    # meta.json is replaced last, so a crash mid-save leaves the previous
    # complete snapshot loadable (ADVICE r1: in-place writes could brick boot).

    def freeze(self) -> dict:
        """Capture an immutable view (call under the writer lock; every
        mutation REPLACES arrays, so holding references is safe)."""
        self.flush()
        return {
            "dim": self.dim,
            "embeddings": self.embeddings,
            "track": self.track,
            "offset_sec": self.offset_sec,
            "chunk_index": self.chunk_index,
        }

    @staticmethod
    def write_snapshot(path: str | Path, frozen: dict) -> None:
        """Stream a frozen view to disk (safe to run off-lock)."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        from audio_ident_tpu.index import snapio

        snapio.save_arrays(
            path / "vectors.snap",
            {
                "format_version": np.array(FORMAT_VERSION, np.int32),
                "embeddings": frozen["embeddings"],
                "track": frozen["track"],
                "offset_sec": frozen["offset_sec"],
                "chunk_index": frozen["chunk_index"],
            },
        )
        snapio.atomic_write_text(path / "meta.json", json.dumps({"dim": frozen["dim"]}))

    def save(self, path: str | Path) -> None:
        self.write_snapshot(path, self.freeze())

    @classmethod
    def load(cls, path: str | Path) -> "VectorStore":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        if (path / "vectors.snap").exists():
            from audio_ident_tpu.index import snapio

            data = snapio.load_arrays(path / "vectors.snap")
        else:  # round-1 legacy layout
            data = dict(np.load(path / "vectors.npz"))
        if int(data["format_version"]) != FORMAT_VERSION:
            raise ValueError("vector store format mismatch; rebuild from raw")
        vs = cls(dim=int(meta["dim"]))
        vs.embeddings = data["embeddings"]
        vs.track = data["track"]
        vs.offset_sec = data["offset_sec"]
        vs.chunk_index = data["chunk_index"]
        return vs

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

    # -- durability ------------------------------------------------------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        self.flush()
        np.savez_compressed(
            path / "vectors.npz",
            format_version=np.int32(FORMAT_VERSION),
            embeddings=self.embeddings,
            track=self.track,
            offset_sec=self.offset_sec,
            chunk_index=self.chunk_index,
        )
        (path / "meta.json").write_text(json.dumps({"dim": self.dim}))

    @classmethod
    def load(cls, path: str | Path) -> "VectorStore":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        data = np.load(path / "vectors.npz")
        if int(data["format_version"]) != FORMAT_VERSION:
            raise ValueError("vector store format mismatch; rebuild from raw")
        vs = cls(dim=int(meta["dim"]))
        vs.embeddings = data["embeddings"]
        vs.track = data["track"]
        vs.offset_sec = data["offset_sec"]
        vs.chunk_index = data["chunk_index"]
        return vs

"""Host-side fingerprint index: source of truth + snapshot/restore.

Replaces the reference's Olaf LMDB inverted index (``hash -> (track, time)``,
reference: audio-ident-service/app/audio/fingerprint.py:1-11) with NumPy
arrays in the frozen CSR+delta layout shared with the device matcher.

Write model (single-writer, mirroring the reference's ingest lock,
reference: app/routers/ingest.py:49-52):
- ``add_track`` appends postings to a pending list (cheap);
- ``flush`` lexsorts pending into the delta (amortized);
- ``merge_delta`` folds the delta into the main CSR (LSM compaction) and
  drops tombstoned tracks' postings;
- ``delete_track`` clears a tombstone bit (postings removed at next merge).

Durability: ``save``/``load`` snapshot to an .npz + JSON registry — the
"checkpoint surface" SURVEY.md §5 calls for (the reference's equivalent is
rebuild-from-raw, which we also support at the service layer).
"""

from __future__ import annotations

import json
import uuid as uuidlib
from pathlib import Path

import numpy as np

from audio_ident_tpu import spec


class FingerprintIndex:
    """In-memory fingerprint index with LSM-style delta + tombstones."""

    def __init__(self, max_tracks: int = 1 << 20) -> None:
        self.max_tracks = max_tracks
        # main CSR
        self.offsets = np.zeros(spec.HASH_SPACE + 1, dtype=np.int32)
        self.tracks = np.zeros(0, dtype=np.int32)
        self.times = np.zeros(0, dtype=np.int32)
        # delta (lexsorted by (hash, track, time))
        self.d_hash = np.zeros(0, dtype=np.int32)
        self.d_track = np.zeros(0, dtype=np.int32)
        self.d_time = np.zeros(0, dtype=np.int32)
        # pending (unsorted appends, folded in by flush())
        self._pending: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        # tombstones + registry
        self.track_valid = np.zeros(max_tracks, dtype=bool)
        self.row_to_uuid: list[str] = []
        self.uuid_to_row: dict[str, int] = {}
        self.version = 0  # bumped on every mutation (device cache key)

    # -- registry ------------------------------------------------------------

    @property
    def num_tracks(self) -> int:
        return len(self.row_to_uuid)

    @property
    def num_postings(self) -> int:
        return len(self.tracks) + self.delta_count

    @property
    def delta_count(self) -> int:
        return len(self.d_hash) + sum(len(p[0]) for p in self._pending)

    def row_of(self, track_id: uuidlib.UUID | str) -> int | None:
        return self.uuid_to_row.get(str(track_id))

    def uuid_of(self, row: int) -> str | None:
        if 0 <= row < len(self.row_to_uuid):
            return self.row_to_uuid[row]
        return None

    # -- writes --------------------------------------------------------------

    def add_track(
        self,
        track_id: uuidlib.UUID | str,
        hashes: np.ndarray,
        t_anchor: np.ndarray,
        valid: np.ndarray | None = None,
    ) -> int:
        """Register a track and queue its postings.  Returns the row id."""
        key = str(track_id)
        if key in self.uuid_to_row:
            raise ValueError(f"track {key} already indexed")
        row = len(self.row_to_uuid)
        if row >= self.max_tracks:
            raise RuntimeError("track capacity exhausted")
        self.row_to_uuid.append(key)
        self.uuid_to_row[key] = row
        self.track_valid[row] = True

        if valid is not None:
            hashes = hashes[valid]
            t_anchor = t_anchor[valid]
        h = np.asarray(hashes).astype(np.int64).astype(np.int32)
        t = np.asarray(t_anchor, dtype=np.int32)
        r = np.full(len(h), row, dtype=np.int32)
        self._pending.append((h, r, t))
        self.version += 1
        return row

    def delete_track(self, track_id: uuidlib.UUID | str) -> bool:
        """Tombstone a track (postings dropped at next merge)."""
        row = self.uuid_to_row.get(str(track_id))
        if row is None:
            return False
        if not self.track_valid[row]:
            return False
        self.track_valid[row] = False
        self.version += 1
        return True

    def flush(self) -> None:
        """Fold pending appends into the sorted delta (native radix sort
        when the C++ runtime is built; NumPy lexsort otherwise)."""
        if not self._pending:
            return
        from audio_ident_tpu.utils.native import sort_postings

        hs = [self.d_hash] + [p[0] for p in self._pending]
        rs = [self.d_track] + [p[1] for p in self._pending]
        ts = [self.d_time] + [p[2] for p in self._pending]
        self.d_hash, self.d_track, self.d_time = sort_postings(
            np.concatenate(hs), np.concatenate(rs), np.concatenate(ts)
        )
        self._pending.clear()

    def merge_delta(self) -> None:
        """LSM compaction: delta -> main CSR; drop tombstoned postings.

        Runs the C++ merge kernel when built (both runs are already sorted,
        so compaction is one linear merge pass instead of a global lexsort).
        """
        self.flush()
        from audio_ident_tpu.utils.native import merge_postings

        r, t, offsets = merge_postings(
            self._main_hashes(), self.tracks, self.times,
            self.d_hash, self.d_track, self.d_time,
            self.track_valid,
        )
        self.offsets = offsets.astype(np.int32)
        self.tracks, self.times = r, t
        self.d_hash = np.zeros(0, dtype=np.int32)
        self.d_track = np.zeros(0, dtype=np.int32)
        self.d_time = np.zeros(0, dtype=np.int32)
        self.version += 1

    def _main_hashes(self) -> np.ndarray:
        """Reconstruct per-posting hashes of the main CSR from offsets."""
        n = len(self.tracks)
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        counts = np.diff(self.offsets.astype(np.int64))
        return np.repeat(
            np.arange(spec.HASH_SPACE, dtype=np.int32), counts
        )

    # -- durability ----------------------------------------------------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        self.flush()
        np.savez_compressed(
            path / "index.npz",
            format_version=np.int32(spec.FORMAT_VERSION),
            offsets=self.offsets,
            tracks=self.tracks,
            times=self.times,
            d_hash=self.d_hash,
            d_track=self.d_track,
            d_time=self.d_time,
            track_valid=self.track_valid,
        )
        (path / "registry.json").write_text(
            json.dumps({"rows": self.row_to_uuid, "max_tracks": self.max_tracks})
        )
        # the snapshot now covers everything: drop absorbed WAL entries
        wal = path / "wal"
        if wal.is_dir():
            for f in wal.glob("*.npz"):
                f.unlink()

    # -- write-ahead log: per-track postings survive crashes between
    # snapshots (the reference's only recovery is full rebuild-from-raw;
    # ours replays the WAL on load and falls back to rebuild) ---------------

    def wal_append(self, path: str | Path, track_id: str, hashes, t_anchor) -> None:
        wal = Path(path) / "wal"
        wal.mkdir(parents=True, exist_ok=True)
        np.savez(wal / f"{track_id}.npz", h=np.asarray(hashes, np.int32),
                 t=np.asarray(t_anchor, np.int32))

    def wal_replay(self, path: str | Path) -> int:
        """Re-add WAL tracks missing from the registry; returns the count."""
        wal = Path(path) / "wal"
        if not wal.is_dir():
            return 0
        n = 0
        for f in sorted(wal.glob("*.npz")):
            track_id = f.stem
            if track_id in self.uuid_to_row:
                continue
            data = np.load(f)
            self.add_track(track_id, data["h"].astype(np.int64), data["t"])
            n += 1
        return n

    @classmethod
    def load(cls, path: str | Path) -> "FingerprintIndex":
        path = Path(path)
        reg = json.loads((path / "registry.json").read_text())
        data = np.load(path / "index.npz")
        if int(data["format_version"]) != spec.FORMAT_VERSION:
            raise ValueError(
                f"index format {int(data['format_version'])} != {spec.FORMAT_VERSION}; "
                "rebuild from the raw blob store"
            )
        idx = cls(max_tracks=int(reg["max_tracks"]))
        idx.offsets = data["offsets"]
        idx.tracks = data["tracks"]
        idx.times = data["times"]
        idx.d_hash = data["d_hash"]
        idx.d_track = data["d_track"]
        idx.d_time = data["d_time"]
        idx.track_valid = data["track_valid"]
        idx.row_to_uuid = list(reg["rows"])
        idx.uuid_to_row = {u: i for i, u in enumerate(idx.row_to_uuid)}
        return idx

"""Host-side fingerprint index: source of truth + snapshot/restore.

Replaces the reference's Olaf LMDB inverted index (``hash -> (track, time)``,
reference: audio-ident-service/app/audio/fingerprint.py:1-11) with NumPy
arrays in the frozen CSR+delta layout shared with the device matcher.

Write model (single-writer, mirroring the reference's ingest lock,
reference: app/routers/ingest.py:49-52):
- ``add_track`` appends postings to a pending list (cheap);
- ``flush`` lexsorts pending into the delta (amortized);
- ``merge_delta`` folds the delta into the main CSR (LSM compaction) and
  drops tombstoned tracks' postings — via a CSR-walking C++ merge that
  never materializes per-posting hashes for the main run;
- ``delete_track`` clears a tombstone bit (postings removed at next merge).

Durability: ``freeze()`` captures an immutable view under the writer lock;
``write_snapshot`` streams it to disk OUTSIDE the lock (zstd, atomic
rename, manifest — see snapio.py).  The segmented WAL (wal.py) covers
everything between snapshots.  The reference's equivalent is
rebuild-from-raw, which we also support at the service layer.
"""

from __future__ import annotations

import json
import uuid as uuidlib
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from audio_ident_tpu import spec
from audio_ident_tpu.index import snapio


@dataclass
class IndexSnapshot:
    """Immutable view captured under the writer lock.  Arrays are the live
    references — every mutation path REPLACES arrays rather than writing
    into them (delete_track copies-on-write; add_track only flips True a
    row beyond this snapshot's registry, which loaders ignore)."""

    offsets: np.ndarray
    tracks: np.ndarray
    times: np.ndarray
    d_hash: np.ndarray
    d_track: np.ndarray
    d_time: np.ndarray
    track_valid: np.ndarray
    row_to_uuid: list[str]
    max_tracks: int
    version: int
    merge_gen: int = 0


def write_snapshot(path: str | Path, snap: IndexSnapshot) -> None:
    """Stream a frozen snapshot to disk (safe to run off-lock).

    Incremental layout (round 3): the main CSR — by far the biggest part,
    ~46 GB at the 1M-track target — changes ONLY at LSM compaction, so it
    is written once per merge generation as ``main-<gen>.snap`` and reused
    by every later snapshot until the next compaction.  The per-snapshot
    cost is just the delta + registry (``delta-<version>.snap`` +
    ``registry-<version>.json``).  Round 2's monolithic layout rewrote the
    full CSR on every snapshot (110 s at 100k tracks, ~20 min extrapolated
    at 1M — unusable as a periodic checkpoint).

    An atomically-replaced, fsynced ``MANIFEST.json`` names the trio;
    unreferenced generations are garbage-collected after the manifest
    flips.  A crash at any point leaves either the previous complete
    snapshot or the new one.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    main_name = f"main-{snap.merge_gen:012d}.snap"
    delta_name = f"delta-{snap.version:012d}.snap"
    reg_name = f"registry-{snap.version:012d}.json"
    if not (path / main_name).exists():
        snapio.save_arrays(
            path / main_name,
            {
                "format_version": np.array(spec.FORMAT_VERSION, np.int32),
                "offsets": snap.offsets,
                "tracks": snap.tracks,
                "times": snap.times,
            },
        )
    snapio.save_arrays(
        path / delta_name,
        {
            "format_version": np.array(spec.FORMAT_VERSION, np.int32),
            "d_hash": snap.d_hash,
            "d_track": snap.d_track,
            "d_time": snap.d_time,
            "track_valid": snap.track_valid,
        },
    )
    snapio.atomic_write_text(
        path / reg_name,
        json.dumps({"rows": snap.row_to_uuid, "max_tracks": snap.max_tracks}),
    )
    snapio.atomic_write_text(
        path / "MANIFEST.json",
        json.dumps(
            {
                "main": main_name,
                "delta": delta_name,
                "registry": reg_name,
                "version": snap.version,
                "merge_gen": snap.merge_gen,
            }
        ),
    )
    # GC superseded generations (manifest already points at the new trio)
    keep = {main_name, delta_name, reg_name}
    for pattern in ("main-*.snap", "delta-*.snap", "registry-*.json",
                    "index-*.snap", "*.tmp"):
        for f in path.glob(pattern):
            if f.name not in keep:
                f.unlink(missing_ok=True)


class FingerprintIndex:
    """In-memory fingerprint index with LSM-style delta + tombstones."""

    def __init__(self, max_tracks: int = 1 << 20) -> None:
        self.max_tracks = max_tracks
        # main CSR — offsets are int64: cumulative postings pass 2^31 at
        # ~300k tracks of full-length audio (the 1M-track BASELINE shape
        # is ~3-6B postings).  Device mirrors narrow per shard, where the
        # rebased range always fits int32.
        self.offsets = np.zeros(spec.HASH_SPACE + 1, dtype=np.int64)
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
        # bumped only by apply_merge: keys the on-disk main-CSR snapshot
        # file, which is immutable between compactions (incremental
        # snapshots reuse it instead of rewriting ~46 GB per checkpoint)
        self.merge_gen = 0

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
        """Tombstone a track (postings removed at next merge).

        Durability of the tombstone is the caller's job: EngineState writes
        a DELETE record to the WAL before acknowledging (ADVICE r1: an
        in-memory-only tombstone resurrected deleted tracks after a crash).
        """
        row = self.uuid_to_row.get(str(track_id))
        if row is None:
            return False
        if not self.track_valid[row]:
            return False
        # copy-on-write so frozen snapshots in flight stay consistent
        tv = self.track_valid.copy()
        tv[row] = False
        self.track_valid = tv
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

        The C++ kernel walks the main run's CSR offsets directly (no
        per-posting hash materialization — round 1 allocated a
        HASH_SPACE-repeat int32 array, a multi-GB spike at 1M tracks).
        """
        self.flush()
        from audio_ident_tpu.utils.native import merge_postings_csr

        r, t, offsets = merge_postings_csr(
            self.offsets, self.tracks, self.times,
            self.d_hash, self.d_track, self.d_time,
            self.track_valid,
        )
        self.apply_merge(offsets, r, t)

    def apply_merge(
        self, offsets: np.ndarray, tracks: np.ndarray, times: np.ndarray
    ) -> None:
        """Install the result of a (possibly off-thread) merge run.

        The caller guarantees the index was not mutated between capturing
        the merge inputs and this install — the service holds the
        single-writer lock across flush + merge + install, so background
        compaction never loses concurrently appended postings."""
        self.offsets = offsets.astype(np.int64)
        self.tracks, self.times = tracks, times
        self.d_hash = np.zeros(0, dtype=np.int32)
        self.d_track = np.zeros(0, dtype=np.int32)
        self.d_time = np.zeros(0, dtype=np.int32)
        self.version += 1
        self.merge_gen += 1

    # -- durability ----------------------------------------------------------

    def freeze(self) -> IndexSnapshot:
        """Capture an immutable snapshot view (call under the writer lock;
        cheap — flushes pending, copies only the registry list)."""
        self.flush()
        return IndexSnapshot(
            offsets=self.offsets,
            tracks=self.tracks,
            times=self.times,
            d_hash=self.d_hash,
            d_track=self.d_track,
            d_time=self.d_time,
            track_valid=self.track_valid,
            row_to_uuid=list(self.row_to_uuid),
            max_tracks=self.max_tracks,
            version=self.version,
            merge_gen=self.merge_gen,
        )

    def save(self, path: str | Path) -> None:
        """Freeze + write in one call (CLI / tests; the service snapshots
        off-lock via freeze() + write_snapshot())."""
        write_snapshot(path, self.freeze())

    @classmethod
    def load(cls, path: str | Path) -> "FingerprintIndex":
        path = Path(path)
        manifest_path = path / "MANIFEST.json"
        merge_gen = 0
        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            reg = json.loads((path / manifest["registry"]).read_text())
            if "main" in manifest:  # round-3 incremental layout
                data = snapio.load_arrays(path / manifest["main"])
                data.update(snapio.load_arrays(path / manifest["delta"]))
                merge_gen = int(manifest.get("merge_gen", 0))
            else:  # round-2 monolithic layout
                data = snapio.load_arrays(path / manifest["index"])
        elif (path / "index.npz").exists():  # round-1 legacy layout
            reg = json.loads((path / "registry.json").read_text())
            data = dict(np.load(path / "index.npz"))
        else:
            raise FileNotFoundError(f"no snapshot manifest under {path}")
        if int(data["format_version"]) != spec.FORMAT_VERSION:
            raise ValueError(
                f"index format {int(data['format_version'])} != {spec.FORMAT_VERSION}; "
                "rebuild from the raw blob store"
            )
        idx = cls(max_tracks=int(reg["max_tracks"]))
        idx.offsets = np.asarray(data["offsets"], np.int64)  # pre-r3: int32
        idx.tracks = data["tracks"]
        idx.times = data["times"]
        idx.d_hash = data["d_hash"]
        idx.d_track = data["d_track"]
        idx.d_time = data["d_time"]
        idx.track_valid = np.array(data["track_valid"], dtype=bool)
        idx.row_to_uuid = list(reg["rows"])
        idx.uuid_to_row = {u: i for i, u in enumerate(idx.row_to_uuid)}
        idx.merge_gen = merge_gen
        return idx


def snapshot_exists(path: str | Path) -> bool:
    path = Path(path)
    return (path / "MANIFEST.json").exists() or (path / "registry.json").exists()

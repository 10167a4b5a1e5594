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
    n_shards = _snapshot_shards()
    main_names = [
        f"main-{snap.merge_gen:012d}.s{k:02d}of{n_shards:02d}.snap"
        for k in range(n_shards)
    ]
    if not all((path / n).exists() for n in main_names):
        _write_main_shards(path, main_names, snap, n_shards)
    snapio.save_arrays(
        path / (delta_name := f"delta-{snap.version:012d}.snap"),
        {
            "format_version": np.array(spec.FORMAT_VERSION, np.int32),
            "d_hash": snap.d_hash,
            "d_track": snap.d_track,
            "d_time": snap.d_time,
            "track_valid": snap.track_valid,
        },
    )
    reg_name = f"registry-{snap.version:012d}.json"
    snapio.atomic_write_text(
        path / reg_name,
        json.dumps({"rows": snap.row_to_uuid, "max_tracks": snap.max_tracks}),
    )
    snapio.atomic_write_text(
        path / "MANIFEST.json",
        json.dumps(
            {
                "main_shards": main_names,
                # per-shard posting counts let the loader compute every
                # shard's destination base up front and decode shards
                # fully in parallel (valid until the next merge_gen —
                # exactly the lifetime of the main shard files)
                "main_shard_postings": [
                    int(snap.offsets[(k + 1) * (spec.HASH_SPACE // n_shards)])
                    - int(snap.offsets[k * (spec.HASH_SPACE // n_shards)])
                    for k in range(n_shards)
                ],
                "delta": delta_name,
                "registry": reg_name,
                "version": snap.version,
                "merge_gen": snap.merge_gen,
            }
        ),
    )
    # GC superseded generations (manifest already points at the new set)
    keep = {*main_names, delta_name, reg_name}
    for pattern in ("main-*.snap", "delta-*.snap", "registry-*.json",
                    "index-*.snap", "*.tmp"):
        for f in path.glob(pattern):
            if f.name not in keep:
                f.unlink(missing_ok=True)


def _snapshot_shards() -> int:
    """Power-of-two main-CSR shard-file count (default 8).

    Boundaries are EQUAL HASH SPANS — the same partitioning
    parallel/sharded_index.py uses — so when the snapshot shard count is a
    multiple of the mesh size, each mesh shard restores by reading only its
    own files (pod-scale parallel restore; r4 verdict item 4)."""
    import os

    s = int(os.environ.get("AUDIO_IDENT_SNAPSHOT_SHARDS", "8"))
    if s < 1 or (s & (s - 1)) or s > 256 or spec.HASH_SPACE % s:
        raise ValueError(f"AUDIO_IDENT_SNAPSHOT_SHARDS={s} must be a power of "
                         "two dividing HASH_SPACE, <=256")
    return s


def _snapshot_level() -> int:
    """zstd level for snapshot payloads.  Negative = zstd fast modes.
    Default -3: measured [see PARITY.md r5] the preconditioned payload
    compresses within a few % of level 1 at ~2x the single-core speed, and
    this host's snapshot writer is CPU-bound, not disk-bound."""
    import os

    return int(os.environ.get("AUDIO_IDENT_SNAPSHOT_ZSTD", "-3"))


def _write_main_shards(
    path: Path, names: list[str], snap: IndexSnapshot, n_shards: int
) -> None:
    """Write the main CSR as hash-range shard files, concurrently.

    Per-shard payload is preconditioned for speed AND size, bit-exactly
    reversible:
    - bucket counts (int32 diff of the int64 offsets slice) instead of
      absolute offsets;
    - tracks delta-encoded (postings are (hash, track, time)-sorted, so
      track ids ascend within a bucket — deltas are small and compress
      far better than raw ids);
    - times split into a uint16 low half + bit-packed 17th bit (the spec
      freezes times < 2^17; reference never stores times at all — LMDB
      keeps them inside Olaf's opaque values).
    Threads help even on small hosts because zstd compression releases
    the GIL and overlaps the write syscalls of other shards.
    """
    import concurrent.futures as cf
    import os

    level = _snapshot_level()
    span = spec.HASH_SPACE // n_shards

    def write_one(k: int) -> None:
        lo, hi = k * span, (k + 1) * span
        a, b = int(snap.offsets[lo]), int(snap.offsets[hi])
        counts = np.diff(snap.offsets[lo : hi + 1]).astype(np.int32)
        tr = np.ascontiguousarray(snap.tracks[a:b], np.int32)
        tm = np.ascontiguousarray(snap.times[a:b], np.int32)
        tr_d = np.empty_like(tr)
        if len(tr):
            tr_d[0] = tr[0]
            np.subtract(tr[1:], tr[:-1], out=tr_d[1:])
        t_lo = (tm & 0xFFFF).astype(np.uint16)
        t_hi = np.packbits((tm >> 16).astype(np.uint8), bitorder="little")
        snapio.save_arrays(
            path / names[k],
            {
                "format_version": np.array(spec.FORMAT_VERSION, np.int32),
                "h_lo": np.array(lo, np.int64),
                "h_hi": np.array(hi, np.int64),
                "n_postings": np.array(b - a, np.int64),
                "counts": counts,
                "tracks_delta": tr_d,
                "times_lo": t_lo,
                "times_hi": t_hi,
            },
            level=level,
            threads=0,
        )

    workers = max(2, min(n_shards, (os.cpu_count() or 1) * 2))
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for f in [ex.submit(write_one, k) for k in range(n_shards)]:
            f.result()


def _decode_shard_into(
    d: dict, offsets: np.ndarray, tracks: np.ndarray, times: np.ndarray,
    base: int,
) -> int:
    """Reverse one shard's preconditioning into the preallocated arrays.

    Bit-exact inverse of _write_main_shards' encoding.  All writes land in
    disjoint slices, so shards may decode concurrently when their bases
    are known up front.  Returns the shard's posting count."""
    lo, hi, n = int(d["h_lo"]), int(d["h_hi"]), int(d["n_postings"])
    np.cumsum(d["counts"], dtype=np.int64, out=offsets[lo + 1 : hi + 1])
    if base:
        offsets[lo + 1 : hi + 1] += base
    if n:
        np.cumsum(d["tracks_delta"], out=tracks[base : base + n])
        hi_bits = np.unpackbits(d["times_hi"], count=n, bitorder="little")
        # two single-pass ufuncs into the preallocated destination
        # (hi<<16 has no overlap with the 16-bit lo, so add == or);
        # the temp-chain formulation (astype | astype<<16) measured
        # 5.8 s/shard on this host vs ~1.5 s for this one
        dst = times[base : base + n]
        np.multiply(hi_bits, np.int32(1 << 16), out=dst, casting="unsafe")
        np.add(dst, d["times_lo"], out=dst, casting="unsafe")
    d.clear()
    return n


def _load_main_shards(
    path: Path, names: list[str], shard_postings: list[int] | None = None
) -> dict:
    """Parallel restore of the sharded main CSR into preallocated arrays.

    When the manifest carries per-shard posting counts (r5), each shard's
    destination base is known before any file is read, so decompression
    AND decode run concurrently per shard (numpy ufuncs and the zstd
    reader both release the GIL); a multi-core host restores in
    ~max(shard) time.  Without counts (older manifests), decode is
    serialized after a parallel load."""
    import concurrent.futures as cf
    import os

    offsets = np.zeros(spec.HASH_SPACE + 1, np.int64)
    workers = max(2, min(len(names), (os.cpu_count() or 1) * 2))

    if shard_postings is not None and len(shard_postings) == len(names):
        bases = [0]
        for n in shard_postings:
            bases.append(bases[-1] + int(n))
        total = bases[-1]
        tracks = np.empty(total, np.int32)
        times = np.empty(total, np.int32)

        def load_decode(i: int) -> None:
            d = snapio.load_arrays(path / names[i])
            if int(d["n_postings"]) != shard_postings[i]:
                raise ValueError(
                    f"{names[i]}: manifest says {shard_postings[i]} postings,"
                    f" payload has {int(d['n_postings'])}"
                )
            _decode_shard_into(d, offsets, tracks, times, bases[i])

        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            for f in [ex.submit(load_decode, i) for i in range(len(names))]:
                f.result()
    else:
        results: list[dict] = [None] * len(names)  # type: ignore[list-item]

        def load_one(i: int) -> None:
            results[i] = snapio.load_arrays(path / names[i])

        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            for f in [ex.submit(load_one, i) for i in range(len(names))]:
                f.result()

        results.sort(key=lambda d: int(d["h_lo"]))
        total = sum(int(d["n_postings"]) for d in results)
        tracks = np.empty(total, np.int32)
        times = np.empty(total, np.int32)
        base = 0
        for d in results:
            base += _decode_shard_into(d, offsets, tracks, times, base)

    return {
        "format_version": np.array(spec.FORMAT_VERSION, np.int32),
        "offsets": offsets,
        "tracks": tracks,
        "times": times,
    }


@dataclass
class MergeInputs:
    """Read-only reference capture of everything the compaction consumes.

    Arrays follow the index's copy-on-write convention (no in-place
    mutation anywhere), so holding these references keeps the data alive
    and immutable while the merge runs on another thread."""

    offsets: np.ndarray
    tracks: np.ndarray
    times: np.ndarray
    d_hash: np.ndarray
    d_track: np.ndarray
    d_time: np.ndarray
    pending: list[tuple[np.ndarray, np.ndarray, np.ndarray]]
    track_valid: np.ndarray


# Per-pass working set of the ranged merge, per delta posting in the pass:
# 12 B gathered (h, r, t int32) + 16 B radix keys/scratch.
_GATHER_BYTES_PER_POSTING = 28
# Default per-pass budget.  At the 100k-track worst case (864M-posting
# delta) this yields 64 hash-range passes whose combined peak sits at the
# exact-size output arrays (~7 GB) instead of the whole-delta flush+sort
# spike (33.8 GB measured in r4, durability_r4.json).
_DEFAULT_MERGE_BUDGET = 512 << 20
_MAX_RANGES = 4096


def _merge_budget_bytes(budget_bytes: int | None) -> int:
    if budget_bytes is not None:
        return budget_bytes
    import os

    mb = int(os.environ.get("AUDIO_IDENT_COMPACT_BUDGET_MB", "0"))
    return (mb << 20) if mb > 0 else _DEFAULT_MERGE_BUDGET


def compute_ranged_merge(
    inputs: MergeInputs, budget_bytes: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bounded-memory LSM compaction: K hash-range passes into exact-size
    output arrays.  Pure function of ``inputs`` — safe off-thread.

    Returns ``(offsets, tracks, times)`` bit-identical to the whole-index
    flush+merge (same (hash, track, time) total order, same tombstone
    filter), but with peak extra memory capped at the output generation
    plus one range's gather+sort scratch (``budget_bytes``), instead of
    3x the delta (the r4 flush's concat + sort copies + radix scratch).

    The reference pays nothing here because LMDB's B-tree maintenance is
    incremental (reference: audio-ident-service/app/audio/fingerprint.py:5-8);
    this is our equivalent of that boundedness for the array-CSR layout.
    """
    from audio_ident_tpu.utils import native

    budget = _merge_budget_bytes(budget_bytes)
    tv = np.ascontiguousarray(inputs.track_valid, np.uint8)

    # -- delta sources as sorted runs ---------------------------------------
    # The sorted delta arrays are one run; pending chunks are sorted into
    # additional runs.  Callers with a pathologically large pending list
    # (bulk rebuild) destructively consolidate it first
    # (FingerprintIndex.consolidate_pending) so this read-only pass only
    # ever copies a small pending.
    runs: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    if len(inputs.d_hash):
        runs.append((inputs.d_hash, inputs.d_track, inputs.d_time))
    unsorted: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for piece in inputs.pending:
        if _is_sorted_run(piece[0], piece[1], piece[2]):
            runs.append(piece)
        else:
            unsorted.append(piece)
    if unsorted:
        h = np.concatenate([p[0] for p in unsorted])
        r = np.concatenate([p[1] for p in unsorted])
        t = np.concatenate([p[2] for p in unsorted])
        runs.append(native.sort_postings(h, r, t))
        del h, r, t, unsorted

    n_delta = sum(len(run[0]) for run in runs)

    # -- exact-size outputs ---------------------------------------------------
    n_live = native.count_live(inputs.tracks, tv)
    for run in runs:
        n_live += native.count_live(run[1], tv)
    r_out = np.empty(n_live, np.int32)
    t_out = np.empty(n_live, np.int32)
    offsets_out = np.zeros(spec.HASH_SPACE + 1, np.int64)

    # -- range plan (power-of-two count so range(h) = h >> shift) -------------
    k_needed = max(1, -(-(n_delta * _GATHER_BYTES_PER_POSTING) // budget))
    n_ranges = 1
    while n_ranges < k_needed and n_ranges < _MAX_RANGES:
        n_ranges *= 2
    shift = spec.HASH_BITS - n_ranges.bit_length() + 1

    # per-run range boundaries via binary search on the sorted hashes
    edges = (np.arange(n_ranges + 1, dtype=np.int64) << shift).astype(np.int64)
    run_bounds = [np.searchsorted(run[0], edges) for run in runs]

    cursor = 0
    for k in range(n_ranges):
        lo, hi = int(edges[k]), int(edges[k + 1])
        parts = [
            (run[0][b[k]: b[k + 1]], run[1][b[k]: b[k + 1]], run[2][b[k]: b[k + 1]])
            for run, b in zip(runs, run_bounds)
            if b[k + 1] > b[k]
        ]
        if len(parts) == 1:
            gh, gr, gt = parts[0]  # single sorted run: use the views directly
        elif parts:
            gh = np.concatenate([p[0] for p in parts])
            gr = np.concatenate([p[1] for p in parts])
            gt = np.concatenate([p[2] for p in parts])
            gh, gr, gt = native.sort_postings(gh, gr, gt)
        else:
            gh = gr = gt = np.zeros(0, np.int32)
        off_view = offsets_out[lo + 1: hi + 1]
        n_written = native.merge_csr_range(
            inputs.offsets, inputs.tracks, inputs.times,
            np.ascontiguousarray(gh, np.int32),
            np.ascontiguousarray(gr, np.int32),
            np.ascontiguousarray(gt, np.int32),
            tv, lo, hi,
            r_out[cursor:], t_out[cursor:], off_view,
        )
        if cursor:
            off_view += cursor
        cursor += n_written
        del parts, gh, gr, gt
    assert cursor == n_live, f"ranged merge wrote {cursor}, expected {n_live}"
    return offsets_out, r_out, t_out


def _is_sorted_run(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> bool:
    """Full (hash, track, time) sortedness check, chunked so the packed-key
    scratch stays bounded.  Classifies pending pieces: runs produced by
    ``consolidate_pending``/``flush`` pass and can be range-sliced as-is
    (including the single-run no-copy fast path); raw ``add_track`` chunks
    fail on the first out-of-order pair and get gathered + sorted."""
    n = len(h)
    if n < 2:
        return True
    step = 1 << 24  # 16M keys -> <=128 MB packed-key scratch per block
    for i in range(0, n, step):
        j = min(n, i + step + 1)  # overlap one element across blocks
        k = (
            (h[i:j].astype(np.int64) << 38)
            | (r[i:j].astype(np.int64) << 17)
            | t[i:j].astype(np.int64)
        )
        if not np.all(k[:-1] <= k[1:]):
            return False
    return True


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
        # bumped only by apply_merge: keys BOTH the on-disk main-CSR
        # snapshot files (immutable between compactions — incremental
        # snapshots reuse them instead of rewriting ~46 GB per checkpoint)
        # AND the device mirror's main tier (DeviceIndex.from_host reuses
        # the resident main arrays between compactions and re-uploads only
        # the delta — a full main re-upload per ingest was the serving-
        # under-ingest bottleneck: 3.4 GB per version bump at 100k tracks)
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

    @property
    def pending_bytes(self) -> int:
        return sum(p[0].nbytes + p[1].nbytes + p[2].nbytes for p in self._pending)

    def consolidate_pending(self, run_postings: int = 32 << 20) -> None:
        """Reorganize the pending chunk list into a few (hash, track, time)-
        sorted runs IN PLACE, freeing the small chunks progressively.

        Same multiset, same ``delta_count`` — only the list's granularity
        changes, which no consumer depends on (``flush`` concatenates and
        re-sorts regardless).  SINGLE-THREAD CALLERS ONLY (bulk rebuild /
        benches): the service routes every pending mutation through the
        device-dispatch thread instead.  Peak extra memory is one run's
        concat + radix scratch (~28 B/posting * run_postings), and
        ``malloc_trim`` returns the freed chunk pages to the OS so the
        bounded-compaction accounting holds (heap-arena pages would
        otherwise stay charged to peak RSS).
        """
        from audio_ident_tpu.utils import native

        if not self._pending:
            return
        src = self._pending
        self._pending = []
        runs: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        cur: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        cur_n = 0
        while src:
            piece = src.pop()
            cur.append(piece)
            cur_n += len(piece[0])
            del piece
            if cur_n >= run_postings or not src:
                h = np.concatenate([p[0] for p in cur])
                r = np.concatenate([p[1] for p in cur])
                t = np.concatenate([p[2] for p in cur])
                cur.clear()
                cur_n = 0
                runs.append(native.sort_postings(h, r, t))
                del h, r, t
                native.malloc_trim()
        self._pending = runs

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

    def merge_delta(self, budget_bytes: int | None = None) -> None:
        """LSM compaction: delta -> main CSR; drop tombstoned postings.

        Runs as bounded-memory hash-range passes when the C++ runtime is
        built (see ``compute_ranged_merge``); otherwise flushes and merges
        whole (the NumPy fallback path, test scale only).
        """
        from audio_ident_tpu.utils import native

        if native.has_merge_csr_range():
            # bulk callers (rebuild-index, benches) can hold the whole
            # index in the pending list; reorganize it into bounded sorted
            # runs IN PLACE first so the read-only merge below never copies
            # more than one run.  (The service never gets here with a big
            # pending — the compaction threshold caps the delta.)
            if self.pending_bytes > _merge_budget_bytes(budget_bytes) // 2:
                self.consolidate_pending()
            inputs = self.capture_merge_inputs()
            offsets, r, t = compute_ranged_merge(inputs, budget_bytes)
            self.apply_merge(offsets, r, t)
            return
        self.flush()
        r, t, offsets = native.merge_postings_csr(
            self.offsets, self.tracks, self.times,
            self.d_hash, self.d_track, self.d_time,
            self.track_valid,
        )
        self.apply_merge(offsets, r, t)

    def capture_merge_inputs(self) -> "MergeInputs":
        """Reference-capture the merge's inputs WITHOUT mutating the index.

        Call on the device-dispatch thread (like ``flush``): the pending
        list is shallow-copied so a concurrent mirror-rebuild flush can
        clear it without pulling arrays out from under the merge.  Every
        captured array is immutable by the index's copy-on-write
        convention, so ``compute_ranged_merge`` can run on any thread.
        """
        return MergeInputs(
            offsets=self.offsets,
            tracks=self.tracks,
            times=self.times,
            d_hash=self.d_hash,
            d_track=self.d_track,
            d_time=self.d_time,
            pending=list(self._pending),
            track_valid=self.track_valid,
        )

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
        # the merge inputs covered the delta AND the pending list (either
        # captured directly by the ranged merge, or folded into the delta
        # by the pre-merge flush) — both are now part of the main run
        self._pending.clear()
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
            if "main_shards" in manifest:  # round-5 per-shard layout
                data = _load_main_shards(
                    path,
                    manifest["main_shards"],
                    manifest.get("main_shard_postings"),
                )
                data.update(snapio.load_arrays(path / manifest["delta"]))
                merge_gen = int(manifest.get("merge_gen", 0))
            elif "main" in manifest:  # round-3 incremental layout
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

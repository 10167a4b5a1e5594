"""Engine state: host index + device mirrors + the TPU dispatch thread.

The reference delegates engine state to external processes (olaf_c's LMDB,
Qdrant); here the engines are in-process device programs over host-owned
arrays.  All device work funnels through ONE executor thread: the TPU
queue replaces the reference's CLAP semaphore (reference:
app/search/vibe.py:29-33), and the single writer thread replaces the Olaf
single-writer rule (reference: app/audio/fingerprint.py:7-8).
"""

from __future__ import annotations

import asyncio
import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from audio_ident_tpu import spec
from audio_ident_tpu.index import wal as wal_mod
from audio_ident_tpu.index.match import DeviceIndex
from audio_ident_tpu.index.store import (
    FingerprintIndex,
    snapshot_exists,
    write_snapshot,
)
from audio_ident_tpu.index.wal import WriteAheadLog
from audio_ident_tpu.search.exact import ExactCandidate, ExactLane

logger = logging.getLogger(__name__)


def load_vibe_lane(checkpoint_path: str | None, *, random_init: bool = False):
    """Build a VibeLane from a torch CLAP checkpoint (or a random twin).

    Returns None when no checkpoint is configured — the service then runs
    exact-only, mirroring the reference's graceful degradation when CLAP
    fails to load (reference: app/main.py:124-127).
    """
    from audio_ident_tpu.models.clap.htsat import ClapAudioConfig
    from audio_ident_tpu.search.vibe import VibeLane

    config = ClapAudioConfig(fast=True)  # bf16 tower in production
    if random_init:
        from audio_ident_tpu.models.clap.port import init_random_params

        params, _ = init_random_params(config, seed=0)
        return VibeLane(params, config)
    if not checkpoint_path:
        return None
    from audio_ident_tpu.models.clap.port import load_checkpoint

    params = load_checkpoint(checkpoint_path, config)
    return VibeLane(params, config)


def resample_rate(pcm: np.ndarray, rate: int, target: int) -> np.ndarray:
    """Host-side rational resampler (arbitrary container rate -> target).

    The 48k->16k hot path has an on-device twin (ops/resample.py); this
    generic polyphase resampler handles arbitrary container rates once per
    file on the host.
    """
    if rate == target:
        return pcm.astype(np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(target, rate)
    return resample_poly(pcm, target // g, rate // g).astype(np.float32)


def resample_to_16k(pcm: np.ndarray, rate: int) -> np.ndarray:
    return resample_rate(pcm, rate, spec.SAMPLE_RATE)


def resample_to_48k(pcm: np.ndarray, rate: int) -> np.ndarray:
    return resample_rate(pcm, rate, spec.EMBED_SAMPLE_RATE)


def ingest_bucket_samples(num_samples: int) -> int:
    dur = num_samples / spec.SAMPLE_RATE
    for b in spec.INGEST_BUCKETS_SEC:
        if dur <= b:
            return b * spec.SAMPLE_RATE
    return spec.INGEST_BUCKETS_SEC[-1] * spec.SAMPLE_RATE


class EngineState:
    """Owns the fingerprint index and serializes device access."""

    def __init__(
        self,
        max_tracks: int = 1 << 20,
        index_dir: str | Path | None = None,
        compile_cache_dir: str | Path | None = None,
        vibe_lane=None,
        vector_dir: str | Path | None = None,
        mesh_shards: int = 0,
    ):
        if compile_cache_dir is not None:
            import jax

            jax.config.update("jax_compilation_cache_dir", str(compile_cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        self.index_dir = Path(index_dir) if index_dir else None
        if self.index_dir and snapshot_exists(self.index_dir):
            self.fp_index = FingerprintIndex.load(self.index_dir)
            logger.info(
                "loaded fingerprint index: %d tracks, %d postings",
                self.fp_index.num_tracks, self.fp_index.num_postings,
            )
        else:
            self.fp_index = FingerprintIndex(max_tracks=max_tracks)
        self._device_index: DeviceIndex | None = None
        self._tpu = ThreadPoolExecutor(max_workers=1, thread_name_prefix="tpu")
        self._write_lock = asyncio.Lock()
        self.defer_rewarm = False  # batch ingest sets this (see above)

        # multi-chip: shard the index over a device mesh (MESH_SHARDS > 1)
        self.mesh = None
        self._sharded_index = None
        if mesh_shards > 1:
            import jax

            from audio_ident_tpu.parallel import make_index_mesh

            devices = jax.devices()
            if len(devices) < mesh_shards:
                raise RuntimeError(
                    f"MESH_SHARDS={mesh_shards} but only {len(devices)} devices"
                )
            self.mesh = make_index_mesh(devices[:mesh_shards])

        # vibe lane (optional): CLAP + vector store share the fp registry
        self.vibe_lane = vibe_lane
        self.vector_dir = Path(vector_dir) if vector_dir else None
        self._device_vectors = None
        if vibe_lane is not None:
            from audio_ident_tpu.vector.store import VectorStore

            if self.vector_dir and (self.vector_dir / "meta.json").exists():
                self.vector_store = VectorStore.load(self.vector_dir)
            else:
                self.vector_store = VectorStore(
                    dim=vibe_lane.config.projection_dim
                )
        else:
            self.vector_store = None

        # one WAL covers fingerprints + embeddings + deletes; replay after
        # BOTH stores are loaded so every record kind can apply
        self.wal: WriteAheadLog | None = None
        if self.index_dir:
            self.wal = WriteAheadLog(self.index_dir / "wal")
            n_fp, n_emb, n_del = self._replay_wal()
            if n_fp or n_emb or n_del:
                logger.info(
                    "WAL replay: %d fingerprint adds, %d embedding batches, "
                    "%d deletes", n_fp, n_emb, n_del,
                )

    def _replay_wal(self) -> tuple[int, int, int]:
        """Apply WAL records not yet absorbed by the snapshots (idempotent:
        adds are skipped for tracks the snapshot already covers)."""
        n_fp = n_emb = n_del = 0
        rows_with_vectors = (
            self.vector_store.rows_present() if self.vector_store is not None else set()
        )
        for rec in self.wal.replay():
            if rec.kind == wal_mod.ADD_FP:
                if self.fp_index.row_of(rec.track_id) is None:
                    self.fp_index.add_track(
                        rec.track_id, rec.hashes.astype(np.int64), rec.times
                    )
                    n_fp += 1
            elif rec.kind == wal_mod.ADD_EMB:
                row = self.fp_index.row_of(rec.track_id)
                if (
                    self.vector_store is not None
                    and row is not None
                    and row not in rows_with_vectors
                    and rec.embeddings.shape[1] == self.vector_store.dim
                ):
                    self.vector_store.add_track(row, rec.embeddings, rec.offsets_sec)
                    rows_with_vectors.add(row)
                    n_emb += 1
            elif rec.kind == wal_mod.DELETE:
                row = self.fp_index.row_of(rec.track_id)
                if self.fp_index.delete_track(rec.track_id):
                    n_del += 1
                    if self.vector_store is not None and row is not None:
                        self.vector_store.delete_track(row)
        return n_fp, n_emb, n_del

    @property
    def vibe_enabled(self) -> bool:
        return self.vibe_lane is not None

    # -- device mirror ---------------------------------------------------------

    def _current_device_index(self) -> DeviceIndex:
        if (
            self._device_index is None
            or self._device_index.version != self.fp_index.version
        ):
            self._device_index = DeviceIndex.from_host(self.fp_index)
        return self._device_index

    def _current_exact_lane(self) -> ExactLane:
        if self.mesh is not None:
            from audio_ident_tpu.parallel import ShardedDeviceIndex

            if (
                self._sharded_index is None
                or self._sharded_index.version != self.fp_index.version
            ):
                self._sharded_index = ShardedDeviceIndex.from_host(
                    self.fp_index, self.mesh
                )
            return ExactLane.sharded(self._sharded_index, self.mesh)
        return ExactLane(self._current_device_index())

    # -- async facade (all device work hops to the TPU thread) ------------------

    async def _run(self, fn, *args):
        return await asyncio.get_running_loop().run_in_executor(self._tpu, fn, *args)

    async def exact_search(
        self, pcm_16k: np.ndarray, max_results: int = 10
    ) -> list[ExactCandidate]:
        def work() -> list[ExactCandidate]:
            from audio_ident_tpu.utils.profiling import device_trace, span

            with span("exact_search"), device_trace():
                return self._current_exact_lane().search(pcm_16k, max_results)

        return await self._run(work)

    async def fingerprint_and_index(self, track_id: str, pcm_16k: np.ndarray) -> int:
        """Fingerprint on device and append postings (single-writer)."""

        def work() -> int:
            from audio_ident_tpu.ops.fingerprint import fingerprint_batch
            from audio_ident_tpu.utils.profiling import span

            with span("fingerprint_index"):
                n = ingest_bucket_samples(len(pcm_16k))
                padded = np.zeros(n, dtype=np.float32)
                m = min(len(pcm_16k), n)
                padded[:m] = pcm_16k[:m]
                budget = spec.max_peaks(n)
                h, t, v = fingerprint_batch(padded[None], budget)
                h = np.asarray(h[0]).astype(np.int64)
                t = np.asarray(t[0])
                v = np.asarray(v[0])
                self.fp_index.add_track(track_id, h, t, v)
                if self.wal is not None:
                    self.wal.append_add(track_id, h[v], t[v])
                return int(v.sum())

        async with self._write_lock:
            result = await self._run(work)
        # Growing postings can cross a pow2 capacity boundary, changing the
        # device-mirror shapes: the next query would then eat a fresh XLA
        # compile and blow its 3 s budget (measured as a 504 in production
        # driving).  Re-warm in the background on the TPU thread — but NOT
        # during batch ingest, where every crossing would trigger 7 slow
        # compiles that block the device queue (the batch driver re-warms
        # once at the end via defer_rewarm).
        if not self.defer_rewarm:
            asyncio.get_running_loop().run_in_executor(
                self._tpu, self._rewarm_if_grown
            )
        return result

    async def content_fingerprint(self, pcm_16k: np.ndarray) -> np.ndarray:
        """Dedup robust-hash on device (the float64 NumPy golden takes
        seconds per 30 s file on this host's single core)."""

        def work() -> np.ndarray:
            import jax

            from audio_ident_tpu import spec as sp
            from audio_ident_tpu.ops.content_fp import (
                _num_frames,
                content_fingerprint_jax,
            )

            n = ingest_bucket_samples(len(pcm_16k))
            padded = np.zeros(n, dtype=np.float32)
            m = min(len(pcm_16k), n)
            padded[:m] = pcm_16k[:m]
            fp = np.asarray(jax.jit(content_fingerprint_jax)(padded))
            true_words = max(_num_frames(len(pcm_16k)) - 1, 0)
            return fp[:true_words].astype(np.uint32)

        return await self._run(work)

    def _rewarm_if_grown(self) -> None:
        try:
            di = self._current_device_index()
            caps = (di.tracks.shape[0], di.d_hash.shape[0])
            if caps == getattr(self, "_warmed_caps", None):
                return
            self._warmed_caps = caps
            lane = self._current_exact_lane()
            lane.search(np.zeros(spec.SUB_WINDOW_BUCKET_SEC * spec.SAMPLE_RATE, np.float32))
            for b in spec.QUERY_BUCKETS_SEC:
                if b <= spec.SHORT_CLIP_THRESHOLD_SEC:
                    continue
                lane.search(np.zeros(b * spec.SAMPLE_RATE, np.float32))
        except Exception:  # noqa: BLE001 — warm-up must never break serving
            logger.exception("background re-warm failed")

    async def embed_and_store(self, track_id: str, pcm_48k: np.ndarray) -> int:
        """Embed all chunks in one batched forward, add to the vector store.

        Must run AFTER fingerprint_and_index registered the track (shares
        the uuid->row registry).  Replaces the reference's sequential
        per-chunk CLAP loop + Qdrant upsert (reference:
        app/ingest/pipeline.py:175-195, app/audio/qdrant_setup.py:85-160).
        """
        assert self.vibe_lane is not None and self.vector_store is not None

        def embed() -> tuple:
            return self.vibe_lane.embed_chunks(pcm_48k)

        # The CLAP forward is read-only w.r.t. engine state: run it on the
        # TPU queue WITHOUT the write lock (round 1 held the lock for the
        # whole forward, serializing ingest against searches more than the
        # single-writer regime requires), then take the lock only for the
        # cheap store append + WAL write.
        emb, offsets = await self._run(embed)
        async with self._write_lock:
            row = self.fp_index.row_of(track_id)
            if row is None:
                raise ValueError(f"track {track_id} not registered")
            self.vector_store.add_track(row, emb, offsets)
            if self.wal is not None:
                # embeddings are WAL-durable too: a crash before the next
                # snapshot must not silently drop tracks from vibe search
                # while the catalog row says they are embedded (ADVICE r1)
                self.wal.append_emb(track_id, emb, offsets)
        return len(emb)

    def _current_device_vectors(self):
        from audio_ident_tpu.vector.search import DeviceVectorIndex

        want = (self.vector_store.version, self.fp_index.version)
        if self._device_vectors is None or self._device_vectors.version != want:
            dvi = DeviceVectorIndex.from_host(
                self.vector_store, track_valid=self.fp_index.track_valid
            )
            dvi.version = want
            self._device_vectors = dvi
        return self._device_vectors

    async def vibe_search(
        self, pcm_48k: np.ndarray, exclude_track_row: int | None = None
    ):
        assert self.vibe_lane is not None

        def work():
            from audio_ident_tpu.utils.profiling import span

            with span("vibe_search"):
                return self.vibe_lane.search_scores(
                    pcm_48k,
                    self._current_device_vectors(),
                    exclude_track_row=exclude_track_row,
                )

        return await self._run(work)

    async def delete_track(self, track_id: str) -> bool:
        async with self._write_lock:
            row = self.fp_index.row_of(track_id)
            ok = self.fp_index.delete_track(track_id)
            if ok and self.vector_store is not None and row is not None:
                self.vector_store.delete_track(row)
            if ok and self.wal is not None:
                # durable tombstone: without this, WAL replay (or a stale
                # snapshot) resurrected deleted fingerprints after a crash
                self.wal.append_delete(track_id)
            return ok

    async def warmup(self) -> None:
        """Compile every query-bucket program before serving traffic.

        Mirrors the reference's 5 s-silence CLAP warm-up
        (app/main.py:114-122) but covers ALL static query shapes: a cold
        compile on the first real request would blow the 3 s exact-lane
        budget (measured: first new-shape search 504s without this).  The
        persistent compilation cache makes warm-up fast on later boots.
        """

        def work() -> None:
            lane = self._current_exact_lane()
            lane.search(np.zeros(4 * spec.SAMPLE_RATE, np.float32))  # sub-window path
            for b in spec.QUERY_BUCKETS_SEC:
                if b <= spec.SHORT_CLIP_THRESHOLD_SEC:
                    continue
                lane.search(np.zeros(b * spec.SAMPLE_RATE, np.float32))

        await self._run(work)

    async def snapshot(self) -> None:
        """Durable snapshot of both stores + WAL truncation.

        The write lock is held only to freeze array references and seal the
        WAL — the multi-GB compress/write streams OUTSIDE the lock (round 1
        blocked all ingest for the duration of a 2.3 GB savez).  Sealed WAL
        segments are deleted only after every snapshot write succeeded.
        """
        async with self._write_lock:
            fp_snap = self.fp_index.freeze() if self.index_dir else None
            vs_snap = (
                self.vector_store.freeze()
                if self.vector_dir and self.vector_store is not None
                else None
            )
            sealed = self.wal.begin_snapshot() if self.wal is not None else []
        if fp_snap is not None:
            await asyncio.to_thread(write_snapshot, self.index_dir, fp_snap)
        if vs_snap is not None:
            await asyncio.to_thread(
                self.vector_store.write_snapshot, self.vector_dir, vs_snap
            )
        if self.wal is not None:
            WriteAheadLog.commit_snapshot(sealed)

    async def close(self) -> None:
        if self.wal is not None:
            self.wal.close()
        self._tpu.shutdown(wait=False)

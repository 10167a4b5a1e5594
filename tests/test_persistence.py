"""Service restart cycle: ingest -> snapshot -> fresh process state ->
search still works (the index snapshot + sqlite catalog + WAL together
survive a restart; the reference leans on external stores for this)."""

import numpy as np
import pytest
import httpx

from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.catalog import Catalog
from audio_ident_tpu.service.settings import Settings
from audio_ident_tpu.service.state import EngineState

from tests.conftest import synth_audio, wav_bytes

pytestmark = pytest.mark.anyio

ADMIN = {"x-admin-key": "k"}


async def test_restart_preserves_index_and_catalog(tmp_path):
    settings = Settings(
        data_root=str(tmp_path / "data"),
        admin_api_key="k",
        max_tracks=1 << 12,
        exact_timeout_sec=300.0,
        vibe_timeout_sec=300.0,
    )
    pcm = synth_audio(np.random.default_rng(77), 15.0, 16000)

    # --- first life: ingest, snapshot on shutdown -------------------------
    engine1 = EngineState(max_tracks=1 << 12, index_dir=settings.index_dir)
    catalog1 = Catalog(settings.catalog_file)
    app1 = create_app(settings, catalog=catalog1, engine=engine1)
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app1), base_url="http://t"
    ) as c:
        r = await c.post(
            "/api/v1/ingest",
            files={"audio": ("keeper.wav", wav_bytes(pcm), "audio/wav")},
            headers=ADMIN,
        )
        assert r.status_code == 201
        tid = r.json()["track_id"]
    await engine1.snapshot()
    catalog1.close()

    # --- second life: fresh objects from the same dirs --------------------
    engine2 = EngineState(max_tracks=1 << 12, index_dir=settings.index_dir)
    assert engine2.fp_index.num_tracks == 1
    catalog2 = Catalog(settings.catalog_file)
    app2 = create_app(settings, catalog=catalog2, engine=engine2)
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app2), base_url="http://t"
    ) as c:
        r = await c.get(f"/api/v1/tracks/{tid}")
        assert r.status_code == 200
        clip = wav_bytes(pcm[3 * 16000 : 11 * 16000])
        r = await c.post(
            "/api/v1/search",
            files={"audio": ("c.wav", clip, "audio/wav")},
            data={"mode": "exact"},
        )
        assert r.status_code == 200, r.text
        top = r.json()["exact_matches"][0]
        assert top["track"]["id"] == tid
        assert abs(top["offset_seconds"] - 3.0) < 0.5


def _fake_postings(rng, n):
    from audio_ident_tpu import spec

    h = rng.integers(0, spec.HASH_SPACE, n).astype(np.int64)
    t = rng.integers(0, 3000, n).astype(np.int32)
    return h, t


def test_incremental_snapshot_reuses_main_csr(tmp_path):
    """Snapshots between compactions must NOT rewrite the main CSR file
    (round 2 rewrote ~46 GB per checkpoint at the 1M-track target)."""
    from audio_ident_tpu.index.store import FingerprintIndex, write_snapshot

    rng = np.random.default_rng(11)
    idx = FingerprintIndex(max_tracks=64)
    idx.add_track("00000000-0000-0000-0000-000000000001", *_fake_postings(rng, 500))
    idx.merge_delta()  # postings land in the main CSR
    write_snapshot(tmp_path, idx.freeze())
    import json as _json

    man1 = _json.loads((tmp_path / "MANIFEST.json").read_text())
    main_stats1 = [(tmp_path / n).stat() for n in man1["main_shards"]]

    # more ingests, NO compaction -> main shards untouched, delta rewritten
    idx.add_track("00000000-0000-0000-0000-000000000002", *_fake_postings(rng, 500))
    write_snapshot(tmp_path, idx.freeze())
    man2 = _json.loads((tmp_path / "MANIFEST.json").read_text())
    assert man2["main_shards"] == man1["main_shards"]
    for name, st1 in zip(man2["main_shards"], main_stats1):
        st = (tmp_path / name).stat()
        assert (st.st_mtime_ns, st.st_ino) == (st1.st_mtime_ns, st1.st_ino)
    assert man2["delta"] != man1["delta"]

    # compaction -> a NEW main generation; the old one is GC'd
    idx.merge_delta()
    write_snapshot(tmp_path, idx.freeze())
    man3 = _json.loads((tmp_path / "MANIFEST.json").read_text())
    assert man3["main_shards"] != man1["main_shards"]
    for name in man1["main_shards"]:
        assert not (tmp_path / name).exists()

    # the loaded index round-trips (both tracks, correct merge_gen)
    idx2 = FingerprintIndex.load(tmp_path)
    assert idx2.num_tracks == 2
    assert idx2.merge_gen == idx.merge_gen
    assert idx2.num_postings == idx.num_postings
    np.testing.assert_array_equal(idx2.offsets, idx.offsets)
    np.testing.assert_array_equal(idx2.tracks, idx.tracks)


def test_load_round2_monolithic_layout(tmp_path):
    """Old on-disk snapshots (single index-<v>.snap) must keep loading."""
    import json as _json

    from audio_ident_tpu import spec
    from audio_ident_tpu.index import snapio
    from audio_ident_tpu.index.store import FingerprintIndex

    rng = np.random.default_rng(12)
    src = FingerprintIndex(max_tracks=64)
    src.add_track("00000000-0000-0000-0000-00000000000a", *_fake_postings(rng, 300))
    src.merge_delta()
    src.add_track("00000000-0000-0000-0000-00000000000b", *_fake_postings(rng, 300))
    src.flush()
    snapio.save_arrays(
        tmp_path / "index-000000000001.snap",
        {
            "format_version": np.array(spec.FORMAT_VERSION, np.int32),
            "offsets": src.offsets,
            "tracks": src.tracks,
            "times": src.times,
            "d_hash": src.d_hash,
            "d_track": src.d_track,
            "d_time": src.d_time,
            "track_valid": src.track_valid,
        },
    )
    snapio.atomic_write_text(
        tmp_path / "registry-000000000001.json",
        _json.dumps({"rows": src.row_to_uuid, "max_tracks": src.max_tracks}),
    )
    snapio.atomic_write_text(
        tmp_path / "MANIFEST.json",
        _json.dumps(
            {
                "index": "index-000000000001.snap",
                "registry": "registry-000000000001.json",
                "version": 1,
            }
        ),
    )
    idx = FingerprintIndex.load(tmp_path)
    assert idx.num_tracks == 2
    np.testing.assert_array_equal(idx.d_hash, src.d_hash)
    np.testing.assert_array_equal(idx.tracks, src.tracks)


@pytest.mark.fast
def test_sharded_snapshot_roundtrip_bit_exact(tmp_path, monkeypatch):
    """Per-shard main-CSR snapshot files (r4 verdict item 4): the
    preconditioned payload (track deltas, split 17-bit times) must restore
    BIT-IDENTICALLY across shard counts and zstd levels, with tombstones
    and a live delta in play."""
    from audio_ident_tpu.index.store import FingerprintIndex, write_snapshot

    rng = np.random.default_rng(12)
    idx = FingerprintIndex(max_tracks=64)
    for i in range(6):
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}",
                      *_fake_postings(rng, 700))
    idx.delete_track("00000000-0000-0000-0000-000000000003")
    idx.merge_delta()
    for i in range(6, 9):  # live delta on top of the compacted main
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}",
                      *_fake_postings(rng, 300))
    idx.flush()

    for shards, level in (("1", "1"), ("4", "-3"), ("16", "3")):
        monkeypatch.setenv("AUDIO_IDENT_SNAPSHOT_SHARDS", shards)
        monkeypatch.setenv("AUDIO_IDENT_SNAPSHOT_ZSTD", level)
        d = tmp_path / f"s{shards}"
        write_snapshot(d, idx.freeze())
        assert len(list(d.glob("main-*.snap"))) == int(shards)
        reborn = FingerprintIndex.load(d)
        np.testing.assert_array_equal(reborn.offsets, idx.offsets)
        np.testing.assert_array_equal(reborn.tracks, idx.tracks)
        np.testing.assert_array_equal(reborn.times, idx.times)
        np.testing.assert_array_equal(reborn.d_hash, idx.d_hash)
        np.testing.assert_array_equal(reborn.d_track, idx.d_track)
        np.testing.assert_array_equal(reborn.d_time, idx.d_time)
        np.testing.assert_array_equal(reborn.track_valid, idx.track_valid)
        assert reborn.row_to_uuid == idx.row_to_uuid
        assert reborn.merge_gen == idx.merge_gen

        # r5: the manifest's main_shard_postings enable fully-parallel
        # decode; an r4-era manifest WITHOUT them must take the sequential
        # fallback and restore the identical arrays
        import json as _json
        man_path = d / "MANIFEST.json"
        man = _json.loads(man_path.read_text())
        assert man["main_shard_postings"] == [
            int((d / n).stat().st_size >= 0)
            and int(np.sum(np.diff(idx.offsets)[
                k * (len(idx.offsets) - 1) // int(shards):
                (k + 1) * (len(idx.offsets) - 1) // int(shards)]))
            for k, n in enumerate(man["main_shards"])
        ]
        del man["main_shard_postings"]
        man_path.write_text(_json.dumps(man))
        legacy = FingerprintIndex.load(d)
        np.testing.assert_array_equal(legacy.offsets, idx.offsets)
        np.testing.assert_array_equal(legacy.tracks, idx.tracks)
        np.testing.assert_array_equal(legacy.times, idx.times)


def test_load_round3_single_main_layout(tmp_path):
    """Snapshots written by the r3/r4 incremental layout (one main file,
    absolute offsets, raw tracks/times) must still load."""
    import json as _json

    from audio_ident_tpu import spec
    from audio_ident_tpu.index import snapio
    from audio_ident_tpu.index.store import FingerprintIndex

    rng = np.random.default_rng(13)
    idx = FingerprintIndex(max_tracks=64)
    for i in range(3):
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}",
                      *_fake_postings(rng, 400))
    idx.merge_delta()

    snapio.save_arrays(tmp_path / "main-000000000001.snap", {
        "format_version": np.array(spec.FORMAT_VERSION, np.int32),
        "offsets": idx.offsets,
        "tracks": idx.tracks,
        "times": idx.times,
    })
    snapio.save_arrays(tmp_path / "delta-000000000004.snap", {
        "format_version": np.array(spec.FORMAT_VERSION, np.int32),
        "d_hash": idx.d_hash, "d_track": idx.d_track, "d_time": idx.d_time,
        "track_valid": idx.track_valid,
    })
    snapio.atomic_write_text(tmp_path / "registry-000000000004.json",
        _json.dumps({"rows": idx.row_to_uuid, "max_tracks": idx.max_tracks}))
    snapio.atomic_write_text(tmp_path / "MANIFEST.json", _json.dumps({
        "main": "main-000000000001.snap",
        "delta": "delta-000000000004.snap",
        "registry": "registry-000000000004.json",
        "version": idx.version, "merge_gen": idx.merge_gen,
    }))
    reborn = FingerprintIndex.load(tmp_path)
    np.testing.assert_array_equal(reborn.offsets, idx.offsets)
    np.testing.assert_array_equal(reborn.tracks, idx.tracks)
    np.testing.assert_array_equal(reborn.times, idx.times)

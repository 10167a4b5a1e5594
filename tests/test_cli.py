"""CLI: batch ingest, snapshot persistence, rebuild-from-raw recovery
(the reference's `make rebuild-index` semantics: raw/ + catalog are the
source of truth, fingerprint/vector indexes are derived — a rebuild must
preserve track uuids and titles, reference: Makefile:96-107)."""

import os

import numpy as np
import pytest

from audio_ident_tpu.service.cli import main

from tests.conftest import synth_audio, wav_bytes


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_ROOT", str(tmp_path / "data"))
    monkeypatch.setenv("MAX_TRACKS", str(1 << 12))
    return tmp_path


def _write_lib(d, n=2):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        (d / f"track{i}.wav").write_bytes(
            wav_bytes(synth_audio(np.random.default_rng(500 + i), 6.0), 16000)
        )


def test_cli_ingest_and_rebuild(env, capsys):
    lib = env / "lib"
    _write_lib(lib)
    assert main(["ingest", str(lib)]) == 0
    out = capsys.readouterr().out
    assert "ingested=2" in out

    # indexes + catalog now exist; blobs are under raw/
    data = env / "data"
    assert (data / "catalog.sqlite3").exists()
    assert (data / "fp_index" / "MANIFEST.json").exists()
    assert any((data / "raw").rglob("*.wav"))

    # re-ingest: all duplicates
    assert main(["ingest", str(lib)]) == 0
    assert "duplicates=2" in capsys.readouterr().out

    # rebuild: drops derived indexes, re-derives from raw/ — and PRESERVES
    # the catalog (uuid + title survive; r3 regression: the old rebuild
    # dropped the catalog, so every track re-titled to its content hash
    # and eval ground-truth mapping broke)
    from audio_ident_tpu.service.catalog import Catalog
    from audio_ident_tpu.service.settings import load_settings

    settings = load_settings()
    cat = Catalog(settings.catalog_file)
    before = {r.id: r.title for r in cat.list_tracks(page=1, page_size=50)[0]}
    cat.close()
    assert sorted(before.values()) == ["track0", "track1"]

    assert main(["rebuild-index"]) == 0
    out = capsys.readouterr().out
    assert "ingested=2" in out
    assert (data / "fp_index" / "MANIFEST.json").exists()

    cat = Catalog(settings.catalog_file)
    after = {r.id: r.title for r in cat.list_tracks(page=1, page_size=50)[0]}
    cat.close()
    assert after == before  # same uuids, same titles

    # the rebuilt index binds postings to the PRESERVED uuids: a direct
    # query of one library file must identify its original track id
    from audio_ident_tpu.index.match import DeviceIndex
    from audio_ident_tpu.index.store import FingerprintIndex
    from audio_ident_tpu.search.exact import ExactLane
    from audio_ident_tpu.service.audio import decode_wav

    fp = FingerprintIndex.load(settings.index_dir)
    lane = ExactLane(DeviceIndex.from_host(fp))
    pcm = decode_wav((lib / "track0.wav").read_bytes()).pcm
    results = lane.search(pcm, max_results=1)
    assert results
    matched_uuid = fp.uuid_of(results[0].track_row)
    assert before[matched_uuid] == "track0"


def test_cli_snapshot(env, capsys):
    lib = env / "lib2"
    _write_lib(lib, n=1)
    assert main(["ingest", str(lib)]) == 0
    capsys.readouterr()
    assert main(["snapshot"]) == 0
    assert "snapshot written" in capsys.readouterr().out


def test_cli_rebuild_without_raw(env, capsys):
    os.environ["DATA_ROOT"] = str(env / "empty")
    assert main(["rebuild-index"]) == 1


def test_wal_crash_recovery(tmp_path):
    """Ingests after the last snapshot survive a crash: the WAL replays on
    the next load (the reference's only recovery is full rebuild-from-raw)."""
    import numpy as np

    from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
    from audio_ident_tpu.cpu_reference.match import match_votes_np
    from audio_ident_tpu.index.store import FingerprintIndex
    from audio_ident_tpu.index.wal import WriteAheadLog

    d = tmp_path / "idx"
    idx = FingerprintIndex(max_tracks=64)
    x0 = synth_audio(np.random.default_rng(1), 10.0)
    h, t, v = fingerprint_np(x0)
    idx.add_track("00000000-0000-0000-0000-000000000000", h, t, v)
    idx.save(d)  # snapshot covers track 0

    # post-snapshot ingest goes to the WAL only (simulated crash: no save)
    wal = WriteAheadLog(d / "wal")
    x1 = synth_audio(np.random.default_rng(2), 10.0)
    h1, t1, v1 = fingerprint_np(x1)
    idx.add_track("00000000-0000-0000-0000-000000000001", h1, t1, v1)
    wal.append_add("00000000-0000-0000-0000-000000000001", h1[v1], t1[v1])
    wal.close()
    del idx

    idx2 = FingerprintIndex.load(d)
    wal2 = WriteAheadLog(d / "wal")
    replayed = 0
    for rec in wal2.replay():
        if idx2.row_of(rec.track_id) is None:
            idx2.add_track(rec.track_id, rec.hashes.astype(np.int64), rec.times)
            replayed += 1
    assert replayed == 1
    assert idx2.num_tracks == 2
    qh, qt, qv = fingerprint_np(x1[2 * 16000 : 8 * 16000])
    idx2.flush()
    res = match_votes_np(
        qh.astype(np.int64), qt, qv, idx2.offsets, idx2.tracks, idx2.times,
        idx2.d_hash, idx2.d_track, idx2.d_time, len(idx2.d_hash),
        idx2.track_valid,
    )
    assert res.track[0] == 1  # the WAL-recovered track matches

    # the snapshot protocol seals + absorbs the WAL
    sealed = wal2.begin_snapshot()
    idx2.save(d)
    WriteAheadLog.commit_snapshot(sealed)
    assert not any(p.stat().st_size for p in (d / "wal").glob("*.wal"))

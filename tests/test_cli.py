"""CLI: batch ingest, snapshot persistence, rebuild-from-raw recovery
(the reference's `make rebuild-index` semantics: raw/ is the source of
truth, indexes and catalog are derived)."""

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
    assert (data / "fp_index" / "registry.json").exists()
    assert any((data / "raw").rglob("*.wav"))

    # re-ingest: all duplicates
    assert main(["ingest", str(lib)]) == 0
    assert "duplicates=2" in capsys.readouterr().out

    # rebuild: drops derived state, re-derives from raw/
    assert main(["rebuild-index"]) == 0
    out = capsys.readouterr().out
    assert "ingested=2" in out
    assert (data / "fp_index" / "registry.json").exists()


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

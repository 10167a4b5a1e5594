"""Eval harness end-to-end: ingest a small library, build a degraded
corpus, run the exact-lane eval, and render the go/no-go report (mirrors
SURVEY.md §4 technique 9: accuracy is tested by the harness, not pytest —
this test checks the harness itself works end to end)."""

import json

import numpy as np
import pytest

from scripts.build_eval_corpus import build_corpus
from scripts.eval_exact import evaluate as eval_exact
from scripts.eval_report import build_report
from audio_ident_tpu.service.cli import main as cli_main
from audio_ident_tpu.service.settings import load_settings

from tests.conftest import synth_audio, wav_bytes


@pytest.fixture()
def ingested_library(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_ROOT", str(tmp_path / "data"))
    monkeypatch.setenv("MAX_TRACKS", str(1 << 12))
    lib = tmp_path / "lib"
    lib.mkdir()
    for i in range(4):
        (lib / f"song{i}.wav").write_bytes(
            wav_bytes(synth_audio(np.random.default_rng(700 + i), 25.0), 16000)
        )
    assert cli_main(["ingest", str(lib)]) == 0
    return lib, tmp_path


def test_eval_pipeline_end_to_end(ingested_library, tmp_path):
    lib, root = ingested_library
    corpus = root / "corpus"
    gt = build_corpus(lib, corpus, n_clips=6, clip_seconds=8.0, n_negatives=2, seed=1)
    assert gt.exists()
    assert len(list(corpus.glob("*.wav"))) == 8

    settings = load_settings()
    metrics = eval_exact(corpus, settings)
    assert metrics["num_queries"] == 8
    assert metrics["num_tracks"] == 4
    # clean clips from the ingested library must identify perfectly
    assert metrics["top1_clean"] == 1.0
    assert metrics["false_positive_rate"] == 0.0
    assert metrics["median_offset_error_sec"] is not None
    assert metrics["median_offset_error_sec"] <= 0.5

    report = build_report(metrics, None, None)
    assert "Exact lane" in report
    assert "Verdict" in report
    assert "top1_clean" in report


def test_report_verdicts():
    good = {k: v for k, v in [
        ("top1_clean", 1.0), ("top1_noisy", 0.9), ("top1_browser", 0.8),
        ("top5_overall", 1.0), ("median_offset_error_sec", 0.1),
        ("false_positive_rate", 0.0),
    ]}
    assert "GO" in build_report(good, None, None)
    bad = dict(good, top1_clean=0.5)  # below the NO-GO floor
    assert "NO-GO" in build_report(bad, None, None)
    mid = dict(good, top1_noisy=0.5)  # miss a target, above the floor
    r = build_report(mid, None, None)
    assert "CONDITIONAL-GO" in r

"""Eval harness end-to-end: ingest a small library, build a degraded
corpus, run the exact-lane eval, and render the go/no-go report (mirrors
SURVEY.md §4 technique 9: accuracy is tested by the harness, not pytest —
this test checks the harness itself works end to end)."""

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
    gt = build_corpus(lib, corpus, n_clips=6, n_negatives=2, seed=1)
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
        ("top1_clean", 1.0), ("top1_mic", 0.9), ("top1_browser", 0.8),
        ("top5_mic", 1.0), ("top1_noisy", 0.9), ("top5_overall", 1.0),
        ("median_offset_error_sec", 0.1), ("false_positive_rate", 0.0),
    ]}
    assert "GO" in build_report(good, None, None)
    bad = dict(good, top1_clean=0.5)  # below the NO-GO floor
    assert "NO-GO" in build_report(bad, None, None)
    mid = dict(good, top1_noisy=0.5)  # miss a target, above the floor
    r = build_report(mid, None, None)
    assert "CONDITIONAL-GO" in r


def test_report_mic_targets_are_frozen():
    """r2 ADVICE high: the reference's frozen mic gates must be scored as
    frozen targets — a failing mic row must surface as FAIL, not be
    demoted to a no-target diagnostic."""
    from scripts.eval_exact import TARGETS

    assert TARGETS["top1_mic"] == 0.75
    assert TARGETS["top5_mic"] == 0.85
    metrics = {
        "top1_clean": 1.0, "top1_mic": 0.667, "top1_browser": 1.0,
        "top5_mic": 0.7, "median_offset_error_sec": 0.1,
        "false_positive_rate": 0.0,
    }
    r = build_report(metrics, None, None)
    assert "| top1_mic | 0.667 | >= 0.75 | FAIL |" in r
    assert "CONDITIONAL-GO" in r


def test_eval_vibe_script(ingested_library, tmp_path, monkeypatch):
    """eval_vibe end-to-end with a small random CLAP injected: self-retrieval
    of degraded clips of ingested tracks yields a meaningful MRR."""
    import scripts.eval_vibe as ev
    from audio_ident_tpu.models.clap.htsat import ClapAudioConfig
    from audio_ident_tpu.models.clap.port import init_random_params
    from audio_ident_tpu.search.vibe import VibeLane
    from audio_ident_tpu.service.catalog import Catalog
    from audio_ident_tpu.service.state import EngineState
    from scripts.build_eval_corpus import build_corpus

    lib, root = ingested_library
    small = ClapAudioConfig(
        spec_size=64, num_mel_bins=16, window_size=4, depths=(2, 2),
        num_heads=(2, 4), patch_embeds_hidden_size=16, hidden_size=32,
        projection_dim=32,
    )
    params, _ = init_random_params(small, seed=21)
    lane = VibeLane(params, small, threshold=0.0)

    # embed the already-ingested library into a vector store + snapshot
    settings = load_settings()
    catalog = Catalog(settings.catalog_file)
    engine = EngineState(
        max_tracks=1 << 12, index_dir=settings.index_dir, vibe_lane=lane,
        vector_dir=settings.vector_dir,
    )
    import asyncio

    from audio_ident_tpu.service.audio import decode_wav

    async def embed_all():
        rows, _t = catalog.list_tracks(page=1, page_size=100)
        for r in rows:
            pcm = decode_wav((root / "data" / "raw").joinpath(
                r.file_hash_sha256[:2], f"{r.file_hash_sha256}.wav"
            ).read_bytes()).pcm
            from audio_ident_tpu.service.state import resample_to_48k

            await engine.embed_and_store(r.id, resample_to_48k(pcm, 16000))
        await engine.snapshot()

    asyncio.run(embed_all())

    corpus = root / "vibe_corpus"
    build_corpus(lib, corpus, n_clips=4, n_negatives=0, seed=3)
    monkeypatch.setattr(
        ev, "load_vibe_lane", lambda *a, **k: lane
    )
    metrics = ev.evaluate(corpus, settings)
    assert metrics["num_queries"] == 4
    assert metrics["mrr"] is not None and metrics["mrr"] >= 0.5

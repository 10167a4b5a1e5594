"""Service-level vibe lane: ingest embeds chunks, search mode=vibe/both
returns similarity-ranked tracks (small random CLAP injected — the
service-level twin of the reference's mocked-CLAP endpoint tests,
SURVEY.md §4 technique 5, but against real engine math)."""

import numpy as np
import pytest
import httpx

from audio_ident_tpu.models.clap.htsat import ClapAudioConfig
from audio_ident_tpu.search.vibe import VibeLane
from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.catalog import Catalog
from audio_ident_tpu.service.settings import Settings
from audio_ident_tpu.service.state import EngineState

from tests.conftest import synth_audio, wav_bytes

pytestmark = pytest.mark.anyio

ADMIN = {"x-admin-key": "k"}

SMALL = ClapAudioConfig(
    spec_size=64,
    num_mel_bins=16,
    window_size=4,
    depths=(2, 2),
    num_heads=(2, 4),
    patch_embeds_hidden_size=16,
    hidden_size=32,
    projection_dim=32,
)


@pytest.fixture(scope="module")
def small_lane():
    from audio_ident_tpu.models.clap.port import init_random_params

    params, _ = init_random_params(SMALL, seed=11)
    # random-weight embeddings cluster, so disable the production threshold
    return VibeLane(params, SMALL, threshold=0.0)


@pytest.fixture()
def app(tmp_path, small_lane):
    settings = Settings(
        data_root=str(tmp_path / "data"),
        admin_api_key="k",
        max_tracks=1 << 12,
        embedding_dim=SMALL.projection_dim,
        exact_timeout_sec=300.0,
        vibe_timeout_sec=300.0,
    )
    engine = EngineState(max_tracks=settings.max_tracks, vibe_lane=small_lane)
    return create_app(settings, catalog=Catalog(":memory:"), engine=engine)


@pytest.fixture()
async def client(app):
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    ) as c:
        yield c


def _wav16(seconds, seed):
    return wav_bytes(synth_audio(np.random.default_rng(seed), seconds, 16000), 16000)


async def test_vibe_search_end_to_end(client):
    r = await client.post(
        "/api/v1/ingest",
        files={"audio": ("a.wav", _wav16(16.0, 101), "audio/wav")},
        headers=ADMIN,
    )
    assert r.status_code == 201, r.text
    tid = r.json()["track_id"]
    r = await client.post(
        "/api/v1/ingest",
        files={"audio": ("b.wav", _wav16(14.0, 102), "audio/wav")},
        headers=ADMIN,
    )
    assert r.status_code == 201

    # track detail records the embedding reference
    detail = (await client.get(f"/api/v1/tracks/{tid}")).json()
    assert detail["embedding_model"] == "clap-htsat-large"
    assert detail["embedding_dim"] == SMALL.projection_dim

    # vibe-only search: the ingested track's own audio must rank first
    clip = wav_bytes(
        synth_audio(np.random.default_rng(101), 16.0, 16000)[: 10 * 16000], 16000
    )
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("q.wav", clip, "audio/wav")},
        data={"mode": "vibe"},
    )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["mode_used"] == "vibe"
    assert body["exact_matches"] == []
    assert body["vibe_matches"], body
    assert body["vibe_matches"][0]["track"]["id"] == tid
    assert body["vibe_matches"][0]["embedding_model"] == "clap-htsat-large"


async def test_mode_both_runs_both_lanes(client):
    pcm = synth_audio(np.random.default_rng(201), 20.0, 16000)
    r = await client.post(
        "/api/v1/ingest",
        files={"audio": ("t.wav", wav_bytes(pcm, 16000), "audio/wav")},
        headers=ADMIN,
    )
    tid = r.json()["track_id"]
    clip = wav_bytes(pcm[4 * 16000 : 12 * 16000], 16000)
    r = await client.post(
        "/api/v1/search", files={"audio": ("q.wav", clip, "audio/wav")}
    )
    body = r.json()
    assert body["mode_used"] == "both"
    assert body["exact_matches"][0]["track"]["id"] == tid
    assert body["vibe_matches"]  # same track audio similar to itself

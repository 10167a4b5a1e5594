"""Service over a sharded index: MESH_SHARDS=8 on the virtual CPU mesh —
the full HTTP ingest+search flow with matching fanned out over the mesh."""

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


@pytest.fixture()
async def client(tmp_path):
    settings = Settings(
        data_root=str(tmp_path / "d"),
        admin_api_key="k",
        max_tracks=1 << 12,
        mesh_shards=8,
        exact_timeout_sec=300.0,
        vibe_timeout_sec=300.0,
    )
    engine = EngineState(max_tracks=settings.max_tracks, mesh_shards=8)
    app = create_app(settings, catalog=Catalog(":memory:"), engine=engine)
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    ) as c:
        yield c


async def test_sharded_service_search(client):
    pcm = synth_audio(np.random.default_rng(60), 20.0, 16000)
    r = await client.post(
        "/api/v1/ingest",
        files={"audio": ("t.wav", wav_bytes(pcm), "audio/wav")},
        headers=ADMIN,
    )
    assert r.status_code == 201, r.text
    tid = r.json()["track_id"]
    await client.post(
        "/api/v1/ingest",
        files={
            "audio": (
                "d.wav",
                wav_bytes(synth_audio(np.random.default_rng(61), 12.0, 16000)),
                "audio/wav",
            )
        },
        headers=ADMIN,
    )

    clip = wav_bytes(pcm[4 * 16000 : 12 * 16000])
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.wav", clip, "audio/wav")},
        data={"mode": "exact"},
    )
    assert r.status_code == 200, r.text
    top = r.json()["exact_matches"][0]
    assert top["track"]["id"] == tid
    assert top["confidence"] == 1.0
    assert abs(top["offset_seconds"] - 4.0) < 0.5

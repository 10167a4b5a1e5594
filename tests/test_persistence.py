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

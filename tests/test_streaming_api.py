"""Streaming identification API (round 3, VERDICT item 7).

The library-level StreamingIdentifier (search/streaming.py) finally gets
an HTTP surface: session create -> chunked PCM pushes with live verdicts
-> close.  BASELINE config #3; the reference has no streaming mode.
"""

import httpx
import numpy as np
import pytest

from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.catalog import Catalog
from audio_ident_tpu.service.settings import Settings
from audio_ident_tpu.service.state import EngineState
from tests.conftest import synth_audio, wav_bytes

pytestmark = pytest.mark.anyio

ADMIN = {"X-Admin-Key": "k"}


@pytest.fixture()
async def client(tmp_path):
    settings = Settings(
        data_root=str(tmp_path / "d"),
        admin_api_key="k",
        max_tracks=1 << 10,
        exact_timeout_sec=300.0,
        vibe_timeout_sec=300.0,
        max_streams=2,
    )
    engine = EngineState(max_tracks=1 << 10)
    app = create_app(settings, catalog=Catalog(":memory:"), engine=engine)
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    ) as c:
        yield c, engine


async def _ingest(c, pcm, name="stream_track.wav"):
    r = await c.post(
        "/api/v1/ingest",
        files={"audio": (name, wav_bytes(pcm), "audio/wav")},
        headers=ADMIN,
    )
    assert r.status_code == 201
    return r.json()["track_id"]


async def test_stream_confirms_mid_stream_with_offset(client):
    c, _engine = client
    track = synth_audio(np.random.default_rng(880), 30.0)
    tid = await _ingest(c, track)

    r = await c.post("/api/v1/stream")
    assert r.status_code == 201
    meta = r.json()
    sid = meta["stream_id"]
    assert meta["pcm_format"] == "pcm_s16le"
    assert meta["sample_rate"] == 16000

    # feed the stream from 12 s into the track, 1-second s16le chunks
    start_sec = 12
    feed = track[16000 * start_sec :]
    confirmed = None
    pushes = 0
    for i in range(0, 20):
        chunk = feed[i * 16000 : (i + 1) * 16000]
        body = (np.clip(chunk, -1, 1) * 32767.0).astype(np.int16).tobytes()
        r = await c.post(
            f"/api/v1/stream/{sid}/audio",
            content=body,
            headers={"content-type": "application/octet-stream"},
        )
        assert r.status_code == 200
        out = r.json()
        pushes += 1
        assert out["position_sec"] == pytest.approx(pushes, abs=0.01)
        if out["confirmed"]:
            confirmed = out
            break
    assert confirmed is not None, "stream never confirmed"
    m = confirmed["match"]
    assert m["track"]["id"] == tid
    # reported offset = where the stream started inside the track
    assert abs(m["offset_seconds"] - start_sec) < 1.0
    assert confirmed["position_sec"] <= 10.0  # confirmed mid-stream, not at end
    assert 0.0 < m["confidence"] <= 1.0

    r = await c.delete(f"/api/v1/stream/{sid}")
    assert r.status_code == 204
    r = await c.post(f"/api/v1/stream/{sid}/audio", content=b"\x00\x00")
    assert r.status_code == 404


async def test_stream_f32_chunks_and_session_cap(client):
    c, _engine = client
    r1 = await c.post("/api/v1/stream")
    r2 = await c.post("/api/v1/stream")
    assert r1.status_code == r2.status_code == 201
    r3 = await c.post("/api/v1/stream")
    assert r3.status_code == 429  # max_streams=2

    sid = r1.json()["stream_id"]
    noise = np.random.default_rng(5).normal(size=16000 * 3).astype(np.float32) * 0.05
    r = await c.post(
        f"/api/v1/stream/{sid}/audio",
        content=noise.tobytes(),
        headers={"content-type": "audio/pcm-f32le"},
    )
    assert r.status_code == 200
    assert r.json()["confirmed"] is False
    assert r.json()["position_sec"] == pytest.approx(3.0, abs=0.01)

    # bad chunks
    r = await c.post(f"/api/v1/stream/{sid}/audio", content=b"")
    assert r.status_code == 400
    r = await c.post(
        f"/api/v1/stream/{sid}/audio",
        content=b"\x00\x00\x00",
        headers={"content-type": "audio/pcm-f32le"},
    )
    assert r.status_code == 400

    for r_ in (r1, r2):
        await c.delete(f"/api/v1/stream/{r_.json()['stream_id']}")


async def test_stream_in_openapi():
    from audio_ident_tpu.service.openapi import build_spec

    spec = build_spec("t", "0")
    assert "/api/v1/stream" in spec["paths"]
    assert "/api/v1/stream/{id}/audio" in spec["paths"]
    schemas = spec["components"]["schemas"]
    assert "StreamPushResponse" in schemas and "StreamCreateResponse" in schemas

"""Endpoint tests over httpx ASGITransport (no sockets), mirroring the
reference's integration-test technique (SURVEY.md §4 techniques 1 and 7)
but against the REAL engine: a live fingerprint index on the test device,
a real sqlite catalog, real WAV decode.
"""

import numpy as np
import pytest
import httpx

from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.catalog import Catalog
from audio_ident_tpu.service.settings import Settings
from audio_ident_tpu.service.state import EngineState

from tests.conftest import synth_audio, wav_bytes

pytestmark = [pytest.mark.anyio, pytest.mark.fast]  # fast: `make test-fast` smoke tier

ADMIN = {"x-admin-key": "test-admin-key"}


@pytest.fixture()
def settings(tmp_path):
    return Settings(
        data_root=str(tmp_path / "data"),
        admin_api_key="test-admin-key",
        max_tracks=1 << 12,
        # generous lane budgets: XLA-CPU cold compiles exceed the production
        # 3 s timeout; timeout semantics are tested with injected lanes in
        # test_orchestrator.py
        exact_timeout_sec=300.0,
        vibe_timeout_sec=300.0,
    )


@pytest.fixture()
def app(settings):
    return create_app(
        settings,
        catalog=Catalog(":memory:"),
        engine=EngineState(max_tracks=settings.max_tracks),
    )


@pytest.fixture()
async def client(app):
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(
        transport=transport, base_url="http://test"
    ) as c:
        yield c


def _wav(seconds=10.0, seed=1, sr=16000):
    return wav_bytes(synth_audio(np.random.default_rng(seed), seconds, sr), sr)


async def _ingest(client, data, name="song.wav", headers=ADMIN):
    return await client.post(
        "/api/v1/ingest",
        files={"audio": (name, data, "audio/wav")},
        headers=headers,
    )


# -- health / version ---------------------------------------------------------


async def test_health(client):
    r = await client.get("/health")
    assert r.status_code == 200
    assert r.json()["status"] == "ok"


async def test_version(client):
    r = await client.get("/api/v1/version")
    assert r.status_code == 200
    body = r.json()
    assert body["name"] == "audio-ident-tpu"
    assert "version" in body


async def test_unknown_route_404(client):
    r = await client.get("/api/v1/nope")
    assert r.status_code == 404
    assert r.json()["error"]["code"] == "NOT_FOUND"


# -- ingest -------------------------------------------------------------------


async def test_ingest_requires_admin_key(client):
    r = await _ingest(client, _wav(), headers={})
    assert r.status_code == 403


async def test_ingest_wrong_admin_key(client):
    r = await _ingest(client, _wav(), headers={"x-admin-key": "wrong"})
    assert r.status_code == 403


async def test_ingest_and_duplicate(client):
    data = _wav(seconds=8.0, seed=11)
    r = await _ingest(client, data, name="first.wav")
    assert r.status_code == 201, r.text
    body = r.json()
    assert body["status"] == "ingested"
    assert body["title"] == "first"

    r2 = await _ingest(client, data, name="again.wav")
    assert r2.status_code == 200
    assert r2.json()["status"] == "duplicate"
    assert r2.json()["track_id"] == body["track_id"]


async def test_ingest_too_short(client):
    r = await _ingest(client, _wav(seconds=1.0))
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "AUDIO_TOO_SHORT"


async def test_ingest_garbage_bytes(client):
    r = await _ingest(client, b"\x00" * 4096)
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "UNSUPPORTED_FORMAT"


async def test_ingest_audio_and_directory_conflict(client):
    r = await client.post(
        "/api/v1/ingest",
        files={"audio": ("a.wav", _wav(), "audio/wav")},
        data={"directory": "/tmp"},
        headers=ADMIN,
    )
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "VALIDATION_ERROR"


async def test_ingest_directory_not_found(client):
    r = await client.post(
        "/api/v1/ingest",
        data={"directory": "/no/such/dir"},
        headers=ADMIN,
    )
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "DIRECTORY_NOT_FOUND"


async def test_ingest_directory_batch(client, tmp_path):
    d = tmp_path / "lib"
    d.mkdir()
    (d / "one.wav").write_bytes(_wav(seconds=6.0, seed=21))
    (d / "two.wav").write_bytes(_wav(seconds=6.0, seed=22))
    (d / "short.wav").write_bytes(_wav(seconds=1.0, seed=23))
    (d / "notes.txt").write_text("not audio")
    r = await client.post(
        "/api/v1/ingest", data={"directory": str(d)}, headers=ADMIN
    )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["total"] == 3
    assert body["ingested"] == 2
    assert len(body["errors"]) == 1


# -- search -------------------------------------------------------------------


async def test_search_end_to_end(client):
    pcm = synth_audio(np.random.default_rng(31), 20.0, 16000)
    r = await _ingest(client, wav_bytes(pcm), name="target.wav")
    assert r.status_code == 201
    track_id = r.json()["track_id"]
    # also ingest a decoy
    await _ingest(client, _wav(seconds=15.0, seed=32), name="decoy.wav")

    clip = wav_bytes(pcm[5 * 16000 : 13 * 16000])
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("clip.wav", clip, "audio/wav")},
        data={"mode": "exact"},
    )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["mode_used"] == "exact"
    assert body["exact_matches"], body
    top = body["exact_matches"][0]
    assert top["track"]["id"] == track_id
    assert top["track"]["title"] == "target"
    assert abs(top["offset_seconds"] - 5.0) < 0.5
    assert top["confidence"] > 0.9


async def test_search_mode_both_degrades_to_exact(client):
    await _ingest(client, _wav(seconds=8.0, seed=41))
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.wav", _wav(seconds=5.0, seed=42), "audio/wav")},
    )
    assert r.status_code == 200
    assert r.json()["mode_used"] == "exact"  # no vibe lane yet


async def test_search_mode_vibe_unavailable(client):
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.wav", _wav(seconds=5.0, seed=43), "audio/wav")},
        data={"mode": "vibe"},
    )
    assert r.status_code == 503
    assert r.json()["error"]["code"] == "SERVICE_UNAVAILABLE"


async def test_search_too_short(client):
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.wav", _wav(seconds=1.5, seed=44), "audio/wav")},
    )
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "AUDIO_TOO_SHORT"


async def test_search_unsupported_format(client):
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.bin", b"\x01\x02" * 100, "application/octet-stream")},
    )
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "UNSUPPORTED_FORMAT"


async def test_search_file_too_large(client, settings):
    big = b"RIFF" + b"\x00" * (settings.max_search_upload_bytes + 16)
    r = await client.post(
        "/api/v1/search", files={"audio": ("c.wav", big, "audio/wav")}
    )
    assert r.status_code == 400
    assert r.json()["error"]["code"] == "FILE_TOO_LARGE"


async def test_search_no_match_returns_empty(client):
    await _ingest(client, _wav(seconds=10.0, seed=51))
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.wav", _wav(seconds=6.0, seed=52), "audio/wav")},
        data={"mode": "exact"},
    )
    assert r.status_code == 200
    assert r.json()["exact_matches"] == []


# -- tracks -------------------------------------------------------------------


async def test_tracks_list_pagination_and_search(client):
    for i, name in enumerate(["alpha.wav", "beta.wav", "gamma.wav"]):
        r = await _ingest(client, _wav(seconds=6.0, seed=60 + i), name=name)
        assert r.status_code == 201
    r = await client.get("/api/v1/tracks", params={"pageSize": 2})
    body = r.json()
    assert len(body["data"]) == 2
    assert body["pagination"]["totalItems"] == 3
    assert body["pagination"]["totalPages"] == 2

    r = await client.get("/api/v1/tracks", params={"search": "bet"})
    body = r.json()
    assert len(body["data"]) == 1
    assert body["data"][0]["title"] == "beta"

    # page past the end: empty data, valid meta
    r = await client.get("/api/v1/tracks", params={"page": 99})
    assert r.json()["data"] == []


async def test_track_detail_and_errors(client):
    r = await _ingest(client, _wav(seconds=7.0, seed=71), name="detail.wav")
    tid = r.json()["track_id"]
    r = await client.get(f"/api/v1/tracks/{tid}")
    assert r.status_code == 200
    body = r.json()
    assert body["title"] == "detail"
    assert body["olaf_indexed"] is True
    assert body["format"] == "wav"
    assert body["file_hash_sha256"]

    r = await client.get("/api/v1/tracks/00000000-0000-0000-0000-00000000dead")
    assert r.status_code == 404
    r = await client.get("/api/v1/tracks/not-a-uuid")
    assert r.status_code == 400


async def test_track_audio_streaming_with_range(client):
    data = _wav(seconds=6.0, seed=81)
    r = await _ingest(client, data, name="stream.wav")
    tid = r.json()["track_id"]

    r = await client.get(f"/api/v1/tracks/{tid}/audio")
    assert r.status_code == 200
    assert r.headers["content-type"] == "audio/wav"
    assert r.headers["accept-ranges"] == "bytes"
    assert r.content == data

    r = await client.get(
        f"/api/v1/tracks/{tid}/audio", headers={"range": "bytes=4-15"}
    )
    assert r.status_code == 206
    assert r.content == data[4:16]
    assert r.headers["content-range"] == f"bytes 4-15/{len(data)}"

    r = await client.get(
        f"/api/v1/tracks/{tid}/audio", headers={"range": "bytes=-8"}
    )
    assert r.status_code == 206
    assert r.content == data[-8:]


async def test_concurrent_ingest_returns_429(client):
    """Single-writer regime: a second ingest while one is in flight gets
    RATE_LIMITED (reference TOCTOU-safe lock: app/routers/ingest.py:149-161)."""
    import asyncio

    big = _wav(seconds=20.0, seed=90)
    small = _wav(seconds=6.0, seed=91)

    async def first():
        return await _ingest(client, big, name="big.wav")

    async def second():
        await asyncio.sleep(0.05)  # let the first acquire the lock
        return await _ingest(client, small, name="small.wav")

    r1, r2 = await asyncio.gather(first(), second())
    codes = sorted([r1.status_code, r2.status_code])
    # one succeeds; the other either hit the lock (429) or ran after (201)
    assert codes[1] in (201, 429)
    assert 201 in codes
    if 429 in codes:
        body = (r2 if r2.status_code == 429 else r1).json()
        assert body["error"]["code"] == "RATE_LIMITED"


async def test_debug_spans_endpoint(client):
    await _ingest(client, _wav(seconds=6.0, seed=95), name="spantest.wav")
    r = await client.get("/api/v1/debug/spans", headers=ADMIN)
    assert r.status_code == 200
    names = {s["name"] for s in r.json()["spans"]}
    assert "fingerprint_index" in names
    # admin-gated
    r = await client.get("/api/v1/debug/spans")
    assert r.status_code == 403


async def test_delete_track(client):
    pcm = synth_audio(np.random.default_rng(97), 12.0, 16000)
    r = await _ingest(client, wav_bytes(pcm), name="doomed.wav")
    tid = r.json()["track_id"]

    # pre-delete: it matches
    clip = wav_bytes(pcm[2 * 16000 : 9 * 16000])
    r = await client.post(
        "/api/v1/search", files={"audio": ("c.wav", clip, "audio/wav")},
        data={"mode": "exact"},
    )
    assert r.json()["exact_matches"][0]["track"]["id"] == tid

    # admin-gated
    r = await client.delete(f"/api/v1/tracks/{tid}")
    assert r.status_code == 403
    r = await client.delete(f"/api/v1/tracks/{tid}", headers=ADMIN)
    assert r.status_code == 204

    # gone from catalog and from search
    assert (await client.get(f"/api/v1/tracks/{tid}")).status_code == 404
    r = await client.post(
        "/api/v1/search", files={"audio": ("c.wav", clip, "audio/wav")},
        data={"mode": "exact"},
    )
    assert all(m["track"]["id"] != tid for m in r.json()["exact_matches"])

    r = await client.delete(f"/api/v1/tracks/{tid}", headers=ADMIN)
    assert r.status_code == 404  # idempotent-ish: second delete is NOT_FOUND

"""Socket-level tests of the asyncio HTTP/1.1 server (the uvicorn
replacement) — a surface the reference never had to test because it
delegated to uvicorn.  Also unit tests for the multipart parser and the
stdlib WAV decoder (real-decode tests mirror SURVEY.md §4 technique 4)."""

import asyncio

import httpx
import numpy as np
import pytest

from audio_ident_tpu.service.audio import DecodeError, decode_wav, sniff_format
from audio_ident_tpu.service.http import App, JSONResponse, Response, serve
from audio_ident_tpu.service.http.multipart import parse_multipart

from tests.conftest import synth_audio, wav_bytes

pytestmark = pytest.mark.anyio


# -- multipart ----------------------------------------------------------------


def test_multipart_roundtrip():
    body = (
        b"--BOUND\r\n"
        b'Content-Disposition: form-data; name="mode"\r\n\r\n'
        b"exact\r\n"
        b"--BOUND\r\n"
        b'Content-Disposition: form-data; name="audio"; filename="a.wav"\r\n'
        b"Content-Type: audio/wav\r\n\r\n"
        b"\x00\x01\r\nbinary\xff\r\n"
        b"--BOUND--\r\n"
    )
    form = parse_multipart(body, "multipart/form-data; boundary=BOUND")
    assert form.value("mode") == "exact"
    f = form.file("audio")
    assert f.filename == "a.wav"
    assert f.data == b"\x00\x01\r\nbinary\xff"


def test_multipart_missing_boundary():
    with pytest.raises(ValueError):
        parse_multipart(b"x", "multipart/form-data")


# -- wav decode / sniffing ----------------------------------------------------


def test_decode_wav_16bit_roundtrip():
    pcm = synth_audio(np.random.default_rng(5), 2.0, 16000)
    d = decode_wav(wav_bytes(pcm, 16000))
    assert d.sample_rate == 16000
    assert d.channels == 1
    assert abs(d.duration_seconds - 2.0) < 0.01
    np.testing.assert_allclose(d.pcm, pcm, atol=1.5 / 32768)


def test_decode_wav_rejects_garbage():
    with pytest.raises(DecodeError):
        decode_wav(b"RIFFxxxxWAVE" + b"\x00" * 100)


def test_sniff_formats():
    assert sniff_format(wav_bytes(np.zeros(100, np.float32)))[0] == "wav"
    assert sniff_format(b"fLaC" + b"\x00" * 20)[0] == "flac"
    assert sniff_format(b"OggS" + b"\x00" * 20)[0] == "ogg"
    assert sniff_format(b"ID3\x04" + b"\x00" * 20)[0] == "mp3"
    assert sniff_format(b"\xff\xfb\x90" + b"\x00" * 20)[0] == "mp3"
    assert sniff_format(b"\x1aE\xdf\xa3" + b"\x00" * 20)[0] == "webm"
    assert sniff_format(b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 8)[0] == "m4a"
    assert sniff_format(b"not audio at all") is None


# -- socket server ------------------------------------------------------------


@pytest.fixture()
async def running_app():
    app = App()

    @app.get("/ping")
    async def ping(_req):
        return JSONResponse({"pong": True})

    @app.post("/echo")
    async def echo(req):
        return Response(req.body, media_type="application/octet-stream")

    @app.get("/tracks/{tid}")
    async def tracks(req):
        return JSONResponse({"id": req.path_params["tid"], "q": req.query})

    ready = asyncio.Event()
    task = asyncio.create_task(serve(app, "127.0.0.1", 0, ready=ready))
    await ready.wait()  # port 0 -> ephemeral; serve records it in app.state
    yield f"http://127.0.0.1:{app.state['bound_port']}"
    task.cancel()
    try:
        await task
    except asyncio.CancelledError:
        pass


async def test_server_get_and_query(running_app):
    async with httpx.AsyncClient() as c:
        r = await c.get(f"{running_app}/ping")
        assert r.status_code == 200
        assert r.json() == {"pong": True}
        r = await c.get(f"{running_app}/tracks/abc123", params={"page": "2"})
        assert r.json()["id"] == "abc123"
        assert r.json()["q"] == {"page": "2"}


async def test_server_post_body_and_keepalive(running_app):
    async with httpx.AsyncClient() as c:
        payload = bytes(range(256)) * 100
        r1 = await c.post(f"{running_app}/echo", content=payload)
        assert r1.content == payload
        # second request over the same keep-alive connection
        r2 = await c.get(f"{running_app}/ping")
        assert r2.status_code == 200


async def test_server_404_and_bad_request(running_app):
    async with httpx.AsyncClient() as c:
        r = await c.get(f"{running_app}/nope")
        assert r.status_code == 404
        assert r.json()["error"]["code"] == "NOT_FOUND"


async def test_sigterm_during_startup_runs_shutdown_hooks():
    """SIGTERM inside a (minutes-long on first boot) startup warm-up must
    still exit through the on_shutdown hooks — the handlers are installed
    BEFORE the startup hooks run, not after the server starts listening."""
    import os
    import signal

    loop = asyncio.get_running_loop()
    try:  # the default SIGTERM action would kill pytest: only run where
        loop.add_signal_handler(signal.SIGUSR1, lambda: None)  # handlers work
        loop.remove_signal_handler(signal.SIGUSR1)
    except (NotImplementedError, RuntimeError):
        pytest.skip("loop signal handlers unavailable in this runner")

    app = App()
    startup_entered = asyncio.Event()
    ran: list[str] = []

    async def slow_startup():
        startup_entered.set()
        await asyncio.sleep(3600)  # "compiling"

    async def on_shutdown():
        ran.append("shutdown")

    app.on_startup.append(slow_startup)
    app.on_shutdown.append(on_shutdown)

    task = asyncio.create_task(serve(app, "127.0.0.1", 0))
    await startup_entered.wait()
    os.kill(os.getpid(), signal.SIGTERM)
    await asyncio.wait_for(task, timeout=10)
    assert ran == ["shutdown"]

"""Minimal ASGI web framework + asyncio HTTP/1.1 server.

The environment ships no FastAPI/Starlette/uvicorn, so the framework is
built from the stdlib: an ASGI 3.0 application object (so tests drive it
in-process through httpx's ASGITransport, mirroring the reference's test
technique — SURVEY.md §4 technique 1) and a production asyncio socket
server speaking HTTP/1.1 to the same app.
"""

from audio_ident_tpu.service.http.asgi import (
    App,
    FileResponse,
    HttpError,
    JSONResponse,
    Request,
    Response,
)
from audio_ident_tpu.service.http.server import serve

__all__ = [
    "App",
    "FileResponse",
    "HttpError",
    "JSONResponse",
    "Request",
    "Response",
    "serve",
]

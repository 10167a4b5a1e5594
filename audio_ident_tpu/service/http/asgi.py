"""Mini ASGI 3.0 framework: routing, requests, responses, errors.

Provides the slice of FastAPI/Starlette surface the service needs — path
params, query params, multipart forms, JSON responses, file responses with
Range/ETag (reference relies on Starlette's FileResponse for streaming
playback: app/routers/tracks.py:262-266), CORS, and app-level exception
mapping (reference: app/main.py:160-183).
"""

from __future__ import annotations

import json
import logging
import os
import re
import typing as t
from email.utils import formatdate

from audio_ident_tpu.service.http.multipart import FormData, parse_multipart

logger = logging.getLogger(__name__)

STATUS_PHRASES = {
    200: "OK", 201: "Created", 204: "No Content", 206: "Partial Content",
    304: "Not Modified", 307: "Temporary Redirect",
    400: "Bad Request", 401: "Unauthorized", 403: "Forbidden",
    404: "Not Found", 405: "Method Not Allowed", 409: "Conflict",
    413: "Payload Too Large", 416: "Range Not Satisfiable",
    422: "Unprocessable Entity", 429: "Too Many Requests",
    500: "Internal Server Error", 503: "Service Unavailable",
    504: "Gateway Timeout",
}


class HttpError(Exception):
    """Error carrying the contract's ErrorResponse shape
    (reference: docs/api-contract.md error-handling section)."""

    def __init__(self, status: int, code: str, message: str, details: t.Any = None):
        super().__init__(message)
        self.status = status
        self.code = code
        self.message = message
        self.details = details

    def to_response(self) -> "JSONResponse":
        err: dict[str, t.Any] = {"code": self.code, "message": self.message}
        if self.details is not None:
            err["details"] = self.details
        return JSONResponse({"error": err}, status=self.status)


def _parse_qs(raw: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for pair in raw.split("&"):
        if not pair:
            continue
        k, _, v = pair.partition("=")
        out[_unquote(k)] = _unquote(v)
    return out


def _unquote(s: str) -> str:
    from urllib.parse import unquote_plus

    return unquote_plus(s)


class Request:
    def __init__(self, scope: dict, body: bytes):
        self.scope = scope
        self.method: str = scope["method"]
        self.path: str = scope["path"]
        self.query: dict[str, str] = _parse_qs(scope.get("query_string", b"").decode())
        self.headers: dict[str, str] = {
            k.decode("latin-1").lower(): v.decode("latin-1")
            for k, v in scope.get("headers", [])
        }
        self.body = body
        self.path_params: dict[str, str] = {}

    def form(self) -> FormData:
        ctype = self.headers.get("content-type", "").lower()
        if ctype.startswith("application/x-www-form-urlencoded"):
            from audio_ident_tpu.service.http.multipart import FormPart

            fd = FormData()
            for k, v in _parse_qs(self.body.decode("utf-8", "replace")).items():
                fd.parts.append(FormPart(k, None, None, v.encode()))
            return fd
        if not ctype.startswith("multipart/form-data"):
            raise HttpError(400, "VALIDATION_ERROR", "expected multipart/form-data")
        try:
            return parse_multipart(self.body, self.headers["content-type"])
        except ValueError as e:
            raise HttpError(400, "VALIDATION_ERROR", f"bad multipart body: {e}") from e

    def json(self) -> t.Any:
        try:
            return json.loads(self.body)
        except json.JSONDecodeError as e:
            raise HttpError(400, "VALIDATION_ERROR", "invalid JSON body") from e


class Response:
    def __init__(
        self,
        body: bytes = b"",
        status: int = 200,
        headers: dict[str, str] | None = None,
        media_type: str = "application/octet-stream",
    ):
        self.body = body
        self.status = status
        self.headers = dict(headers or {})
        self.headers.setdefault("content-type", media_type)

    def encode_headers(self) -> list[tuple[bytes, bytes]]:
        self.headers["content-length"] = str(len(self.body))
        return [
            (k.encode("latin-1"), str(v).encode("latin-1"))
            for k, v in self.headers.items()
        ]


class JSONResponse(Response):
    def __init__(self, data: t.Any, status: int = 200, headers: dict | None = None):
        if hasattr(data, "model_dump"):  # pydantic
            payload = data.model_dump_json().encode()
        else:
            payload = json.dumps(data, default=_json_default).encode()
        super().__init__(payload, status, headers, "application/json")


def _json_default(o: t.Any) -> t.Any:
    if hasattr(o, "model_dump"):
        return o.model_dump()
    if hasattr(o, "isoformat"):
        return o.isoformat()
    raise TypeError(f"not JSON serializable: {type(o)}")


class FileResponse(Response):
    """Whole-file or single-Range response with ETag/Last-Modified.

    Mirrors the behavior Starlette's FileResponse gives the reference for
    `<audio>` seeking (206/Content-Range/Accept-Ranges/ETag,
    reference: docs/api-contract.md track-audio section).
    """

    def __init__(self, path: str, media_type: str, range_header: str | None = None):
        st = os.stat(path)
        etag = f'"{st.st_mtime_ns:x}-{st.st_size:x}"'
        base_headers = {
            "accept-ranges": "bytes",
            "etag": etag,
            "last-modified": formatdate(st.st_mtime, usegmt=True),
        }
        start, end = 0, st.st_size - 1
        status = 200
        if range_header:
            m = re.fullmatch(r"bytes=(\d*)-(\d*)", range_header.strip())
            if not m or (not m.group(1) and not m.group(2)):
                raise HttpError(416, "VALIDATION_ERROR", "malformed Range header")
            if m.group(1):
                start = int(m.group(1))
                if m.group(2):
                    end = min(int(m.group(2)), st.st_size - 1)
            else:  # suffix range: last N bytes
                n = int(m.group(2))
                start = max(st.st_size - n, 0)
            if start >= st.st_size or start > end:
                raise HttpError(416, "VALIDATION_ERROR", "range not satisfiable")
            status = 206
            base_headers["content-range"] = f"bytes {start}-{end}/{st.st_size}"
        with open(path, "rb") as f:
            f.seek(start)
            body = f.read(end - start + 1)
        super().__init__(body, status, base_headers, media_type)


Handler = t.Callable[[Request], t.Awaitable[Response]]


class _Route:
    def __init__(self, method: str, pattern: str, handler: Handler):
        self.method = method
        self.handler = handler
        names: list[str] = []
        regex = ""
        for part in re.split(r"(\{[a-zA-Z_]+\})", pattern):
            if part.startswith("{") and part.endswith("}"):
                name = part[1:-1]
                names.append(name)
                regex += f"(?P<{name}>[^/]+)"
            else:
                regex += re.escape(part)
        self.regex = re.compile(f"^{regex}$")

    def match(self, path: str) -> dict[str, str] | None:
        m = self.regex.match(path)
        return m.groupdict() if m else None


class App:
    """ASGI 3.0 application with path routing and exception mapping."""

    def __init__(self, cors_origins: t.Sequence[str] = ()):
        self.routes: list[_Route] = []
        self.cors_origins = list(cors_origins)
        self.state: dict[str, t.Any] = {}
        self.on_startup: list[t.Callable[[], t.Awaitable[None]]] = []
        self.on_shutdown: list[t.Callable[[], t.Awaitable[None]]] = []

    def route(self, method: str, pattern: str):
        def deco(fn: Handler) -> Handler:
            self.routes.append(_Route(method.upper(), pattern, fn))
            return fn

        return deco

    def get(self, pattern: str):
        return self.route("GET", pattern)

    def post(self, pattern: str):
        return self.route("POST", pattern)

    def delete(self, pattern: str):
        return self.route("DELETE", pattern)

    # -- request dispatch -----------------------------------------------------

    async def handle(self, request: Request) -> Response:
        path_matched = False
        for route in self.routes:
            params = route.match(request.path)
            if params is None:
                continue
            path_matched = True
            if route.method != request.method:
                continue
            request.path_params = params
            try:
                return await route.handler(request)
            except HttpError as e:
                return e.to_response()
            except Exception:
                logger.exception("unhandled error in %s %s", request.method, request.path)
                return HttpError(
                    500, "INTERNAL_ERROR", "An unexpected error occurred"
                ).to_response()
        if request.method == "OPTIONS":
            return Response(b"", 204, {"content-type": "text/plain"})
        if path_matched:
            return HttpError(405, "VALIDATION_ERROR", "method not allowed").to_response()
        return HttpError(404, "NOT_FOUND", "no such endpoint").to_response()

    def _apply_cors(self, request: Request, response: Response) -> None:
        origin = request.headers.get("origin")
        if origin and (origin in self.cors_origins or "*" in self.cors_origins):
            response.headers["access-control-allow-origin"] = origin
            response.headers["access-control-allow-credentials"] = "true"
            response.headers["access-control-allow-methods"] = "*"
            response.headers["access-control-allow-headers"] = "*"

    # -- ASGI 3.0 -------------------------------------------------------------

    async def __call__(self, scope: dict, receive, send) -> None:
        if scope["type"] == "lifespan":
            while True:
                msg = await receive()
                if msg["type"] == "lifespan.startup":
                    for fn in self.on_startup:
                        await fn()
                    await send({"type": "lifespan.startup.complete"})
                elif msg["type"] == "lifespan.shutdown":
                    for fn in self.on_shutdown:
                        await fn()
                    await send({"type": "lifespan.shutdown.complete"})
                    return
            return
        if scope["type"] != "http":
            raise RuntimeError(f"unsupported scope type {scope['type']}")

        body = b""
        while True:
            msg = await receive()
            if msg["type"] == "http.request":
                body += msg.get("body", b"")
                if not msg.get("more_body"):
                    break
            elif msg["type"] == "http.disconnect":
                return

        request = Request(scope, body)
        response = await self.handle(request)
        self._apply_cors(request, response)
        await send(
            {
                "type": "http.response.start",
                "status": response.status,
                "headers": response.encode_headers(),
            }
        )
        await send({"type": "http.response.body", "body": response.body})

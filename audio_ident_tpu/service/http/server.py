"""Asyncio HTTP/1.1 server hosting an ASGI app (the uvicorn replacement).

Single-process, keep-alive capable, bounded request sizes.  The heavy
compute runs on the TPU via the lanes; this loop is pure control plane,
mirroring the reference's single-process asyncio deployment
(SURVEY.md §2 parallelism note).
"""

from __future__ import annotations

import asyncio
import logging

logger = logging.getLogger(__name__)

MAX_HEADER_BYTES = 64 * 1024
MAX_BODY_BYTES = 64 * 1024 * 1024  # hard cap above the 50 MB ingest limit


class _Disconnect(Exception):
    pass


async def _read_request(reader: asyncio.StreamReader):
    head = await reader.readuntil(b"\r\n\r\n")
    if len(head) > MAX_HEADER_BYTES:
        raise _Disconnect("headers too large")
    lines = head.split(b"\r\n")
    try:
        method, target, _version = lines[0].decode("latin-1").split(" ", 2)
    except ValueError as e:
        raise _Disconnect(f"bad request line: {lines[0]!r}") from e
    headers: list[tuple[bytes, bytes]] = []
    content_length = 0
    keep_alive = True
    for line in lines[1:]:
        if not line:
            continue
        k, _, v = line.partition(b":")
        k_l = k.strip().lower()
        v_s = v.strip()
        headers.append((k_l, v_s))
        if k_l == b"content-length":
            content_length = int(v_s)
        elif k_l == b"connection" and v_s.lower() == b"close":
            keep_alive = False
        elif k_l == b"transfer-encoding" and b"chunked" in v_s.lower():
            raise _Disconnect("chunked uploads not supported")
    if content_length > MAX_BODY_BYTES:
        raise _Disconnect("body too large")
    body = await reader.readexactly(content_length) if content_length else b""
    path, _, query = target.partition("?")
    scope = {
        "type": "http",
        "asgi": {"version": "3.0"},
        "http_version": "1.1",
        "method": method.upper(),
        "path": path,
        "raw_path": target.encode("latin-1"),
        "query_string": query.encode("latin-1"),
        "headers": headers,
    }
    return scope, body, keep_alive


async def _handle_connection(app, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
    try:
        while True:
            try:
                scope, body, keep_alive = await _read_request(reader)
            except (asyncio.IncompleteReadError, ConnectionResetError):
                return
            except (_Disconnect, ValueError, asyncio.LimitOverrunError) as e:
                logger.debug("bad request: %s", e)
                writer.write(
                    b"HTTP/1.1 400 Bad Request\r\ncontent-length: 0\r\n"
                    b"connection: close\r\n\r\n"
                )
                await writer.drain()
                return

            sent_body = False
            received = {"done": False}

            async def receive():
                if received["done"]:
                    return {"type": "http.disconnect"}
                received["done"] = True
                return {"type": "http.request", "body": body, "more_body": False}

            async def send(msg):
                nonlocal sent_body
                if msg["type"] == "http.response.start":
                    from audio_ident_tpu.service.http.asgi import STATUS_PHRASES

                    status = msg["status"]
                    phrase = STATUS_PHRASES.get(status, "Unknown")
                    head = [f"HTTP/1.1 {status} {phrase}".encode("latin-1")]
                    for k, v in msg["headers"]:
                        head.append(k + b": " + v)
                    head.append(
                        b"connection: keep-alive" if keep_alive else b"connection: close"
                    )
                    writer.write(b"\r\n".join(head) + b"\r\n\r\n")
                elif msg["type"] == "http.response.body":
                    writer.write(msg.get("body", b""))
                    if not msg.get("more_body"):
                        sent_body = True
                    await writer.drain()

            await app(scope, receive, send)
            if not sent_body:
                return
            if not keep_alive:
                return
    finally:
        try:
            writer.close()
            await writer.wait_closed()
        except (ConnectionError, OSError):
            pass


async def serve(app, host: str = "127.0.0.1", port: int = 17010, *, ready: asyncio.Event | None = None):
    """Run the server until cancelled or signalled.

    ``ready`` is set once listening.  SIGTERM/SIGINT trigger a GRACEFUL
    stop so the on_shutdown hooks (engine snapshot!) run — a bare SIGTERM
    previously killed the process before the snapshot was written, leaving
    recovery entirely to the WAL.  The handlers are installed BEFORE the
    startup hooks: first-boot warm-up can compile for many minutes, and a
    SIGTERM inside that window used to hit the default action (instant
    death, no WAL seal, no snapshot).
    """
    import signal

    stop = asyncio.Event()
    loop = asyncio.get_running_loop()
    installed: list = []
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            loop.add_signal_handler(sig, stop.set)
            installed.append(sig)
        except (NotImplementedError, RuntimeError):  # non-main thread / platform
            pass
    server = None
    try:
        stop_task = asyncio.ensure_future(stop.wait())
        for fn in app.on_startup:
            # race each startup hook against the stop signal so a SIGTERM
            # mid-warm-up still exits through the shutdown hooks
            hook_task = asyncio.ensure_future(fn())
            done, _ = await asyncio.wait(
                {hook_task, stop_task}, return_when=asyncio.FIRST_COMPLETED
            )
            if stop.is_set():
                hook_task.cancel()
                logger.info("stop signal during startup; skipping serve")
                return
            hook_task.result()  # propagate startup errors
        server = await asyncio.start_server(
            lambda r, w: _handle_connection(app, r, w), host, port,
            limit=MAX_HEADER_BYTES,
        )
        sockets = server.sockets or []
        logger.info("listening on %s", [s.getsockname() for s in sockets])
        if sockets and hasattr(app, "state"):
            app.state["bound_port"] = sockets[0].getsockname()[1]
        if ready is not None:
            ready.set()
        async with server:
            serve_task = asyncio.ensure_future(server.serve_forever())
            try:
                done, pending = await asyncio.wait(
                    {stop_task, serve_task}, return_when=asyncio.FIRST_COMPLETED
                )
            finally:
                serve_task.cancel()
    finally:
        stop_task.cancel()
        for sig in installed:
            loop.remove_signal_handler(sig)
        for fn in app.on_shutdown:
            await fn()

"""Streaming-free multipart/form-data parser (stdlib only).

Parses a complete request body against the boundary from the Content-Type
header.  Uploads here are bounded (10 MB search / 50 MB ingest caps,
reference: app/routers/search.py:28, app/routers/ingest.py:35), so parsing
in-memory matches how the reference reads uploads
(``await file.read()``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FormPart:
    name: str
    filename: str | None
    content_type: str | None
    data: bytes


@dataclass
class FormData:
    parts: list[FormPart] = field(default_factory=list)

    def value(self, name: str) -> str | None:
        for p in self.parts:
            if p.name == name and p.filename is None:
                return p.data.decode("utf-8", errors="replace")
        return None

    def file(self, name: str) -> FormPart | None:
        for p in self.parts:
            if p.name == name and p.filename is not None:
                return p
        return None


class MultipartError(ValueError):
    pass


def parse_boundary(content_type: str) -> bytes:
    """Extract the boundary token from a multipart Content-Type header."""
    for param in content_type.split(";")[1:]:
        k, _, v = param.strip().partition("=")
        if k.lower() == "boundary":
            v = v.strip().strip('"')
            if not v:
                break
            return v.encode("latin-1")
    raise MultipartError("missing multipart boundary")


def _parse_part_headers(raw: bytes) -> tuple[str | None, str | None, str | None]:
    name = filename = ctype = None
    for line in raw.split(b"\r\n"):
        if not line:
            continue
        key, _, val = line.partition(b":")
        key = key.strip().lower()
        val_s = val.strip().decode("latin-1")
        if key == b"content-disposition":
            for param in val_s.split(";")[1:]:
                pk, _, pv = param.strip().partition("=")
                pv = pv.strip().strip('"')
                if pk.lower() == "name":
                    name = pv
                elif pk.lower() == "filename":
                    filename = pv
        elif key == b"content-type":
            ctype = val_s
    return name, filename, ctype


def parse_multipart(body: bytes, content_type: str) -> FormData:
    """Parse a complete multipart/form-data body."""
    boundary = parse_boundary(content_type)
    delim = b"--" + boundary
    form = FormData()

    # Split on the delimiter; first chunk is preamble, last is the epilogue
    # after the closing "--" marker.
    chunks = body.split(delim)
    if len(chunks) < 2:
        raise MultipartError("malformed multipart body")
    for chunk in chunks[1:]:
        if chunk.startswith(b"--"):
            break  # closing marker
        # each part starts with \r\n after the delimiter and ends with \r\n
        if chunk.startswith(b"\r\n"):
            chunk = chunk[2:]
        if chunk.endswith(b"\r\n"):
            chunk = chunk[:-2]
        head, sep, data = chunk.partition(b"\r\n\r\n")
        if not sep:
            raise MultipartError("part missing header terminator")
        name, filename, ctype = _parse_part_headers(head)
        if name is None:
            raise MultipartError("part missing content-disposition name")
        form.parts.append(FormPart(name, filename, ctype, data))
    return form

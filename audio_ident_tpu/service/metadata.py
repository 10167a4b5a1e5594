"""Tag metadata extraction (title/artist/album) from container headers.

Replaces the reference's mutagen usage (reference:
audio-ident-service/app/audio/metadata.py:18-159 — ID3 TIT2/TPE1/TALB,
Vorbis comments, MP4 atoms) with a small stdlib parser; mutagen does not
exist in this environment.  Unknown/absent tags fall back to the filename
stem at the pipeline level, mirroring the reference's fallback.

Supported: ID3v2.2/2.3/2.4 (mp3), RIFF LIST/INFO (wav), FLAC
VORBIS_COMMENT, MP4 ilst atoms (m4a).  Ogg Vorbis comment pages are parsed
from the first pages' comment packet when present.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class Tags:
    title: str | None = None
    artist: str | None = None
    album: str | None = None


def extract_tags(data: bytes, fmt: str) -> Tags:
    try:
        if fmt == "mp3":
            return _id3v2(data)
        if fmt == "wav":
            return _riff_info(data)
        if fmt == "flac":
            return _flac_comments(data)
        if fmt == "m4a":
            return _mp4_ilst(data)
        if fmt == "ogg":
            return _ogg_comments(data)
    except Exception:  # noqa: BLE001 — tag parsing is best-effort by contract
        pass
    return Tags()


# -- ID3v2 ----------------------------------------------------------------------

_ID3_MAP = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
            b"TT2": "title", b"TP1": "artist", b"TAL": "album"}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_text(payload: bytes) -> str | None:
    if not payload:
        return None
    enc, rest = payload[0], payload[1:]
    try:
        if enc == 0:
            return rest.decode("latin-1").strip("\x00").strip() or None
        if enc == 1:
            return rest.decode("utf-16").strip("\x00").strip() or None
        if enc == 2:
            return rest.decode("utf-16-be").strip("\x00").strip() or None
        return rest.decode("utf-8").strip("\x00").strip() or None
    except UnicodeDecodeError:
        return None


def _id3v2(data: bytes) -> Tags:
    tags = Tags()
    if len(data) < 10 or data[:3] != b"ID3":
        return tags
    version = data[3]
    size = _syncsafe(data[6:10])
    pos, end = 10, min(10 + size, len(data))
    while pos + 6 <= end:
        if version >= 3:
            if pos + 10 > end:
                break
            fid = data[pos : pos + 4]
            if fid == b"\x00\x00\x00\x00":
                break
            raw = data[pos + 4 : pos + 8]
            fsize = _syncsafe(raw) if version == 4 else struct.unpack(">I", raw)[0]
            body = data[pos + 10 : pos + 10 + fsize]
            pos += 10 + fsize
        else:  # v2.2: 3-byte ids and sizes
            fid = data[pos : pos + 3]
            if fid == b"\x00\x00\x00":
                break
            fsize = int.from_bytes(data[pos + 3 : pos + 6], "big")
            body = data[pos + 6 : pos + 6 + fsize]
            pos += 6 + fsize
        attr = _ID3_MAP.get(fid)
        if attr and getattr(tags, attr) is None:
            setattr(tags, attr, _id3_text(body))
    return tags


# -- RIFF LIST INFO ---------------------------------------------------------------

_RIFF_MAP = {b"INAM": "title", b"IART": "artist", b"IPRD": "album"}


def _riff_info(data: bytes) -> Tags:
    tags = Tags()
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"LIST" and body[:4] == b"INFO":
            sub = 4
            while sub + 8 <= len(body):
                sid = body[sub : sub + 4]
                (ssize,) = struct.unpack_from("<I", body, sub + 4)
                val = body[sub + 8 : sub + 8 + ssize]
                attr = _RIFF_MAP.get(sid)
                if attr:
                    setattr(
                        tags, attr,
                        val.split(b"\x00")[0].decode("utf-8", "replace").strip() or None,
                    )
                sub += 8 + ssize + (ssize & 1)
        pos += 8 + size + (size & 1)
    return tags


# -- vorbis comments (FLAC + Ogg) ---------------------------------------------------

_VC_MAP = {"title": "title", "artist": "artist", "album": "album"}


def _parse_vorbis_comments(body: bytes) -> Tags:
    tags = Tags()
    (vlen,) = struct.unpack_from("<I", body, 0)
    pos = 4 + vlen
    (count,) = struct.unpack_from("<I", body, pos)
    pos += 4
    for _ in range(count):
        (clen,) = struct.unpack_from("<I", body, pos)
        pos += 4
        entry = body[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        key, _, val = entry.partition("=")
        attr = _VC_MAP.get(key.lower())
        if attr and val.strip():
            setattr(tags, attr, val.strip())
    return tags


def _flac_comments(data: bytes) -> Tags:
    if data[:4] != b"fLaC":
        return Tags()
    pos = 4
    while pos + 4 <= len(data):
        header = data[pos]
        block_type = header & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if block_type == 4:  # VORBIS_COMMENT
            return _parse_vorbis_comments(data[pos + 4 : pos + 4 + size])
        pos += 4 + size
        if header & 0x80:  # last block
            break
    return Tags()


def _ogg_comments(data: bytes) -> Tags:
    # comment packet lives in the second+ pages; scan for the marker
    idx = data.find(b"\x03vorbis")
    if idx < 0:
        return Tags()
    return _parse_vorbis_comments(data[idx + 7 : idx + 7 + 65536])


# -- MP4 ilst atoms ---------------------------------------------------------------

_MP4_MAP = {b"\xa9nam": "title", b"\xa9ART": "artist", b"\xa9alb": "album"}


def _mp4_ilst(data: bytes) -> Tags:
    tags = Tags()
    for atom, attr in _MP4_MAP.items():
        idx = data.find(atom)
        if idx < 0 or idx + 8 > len(data):
            continue
        # the child 'data' atom follows: size(4) 'data'(4) type(4) locale(4)
        child = data[idx + 4 : idx + 4 + 16]
        if child[4:8] != b"data":
            continue
        (size,) = struct.unpack_from(">I", child, 0)
        payload = data[idx + 4 + 16 : idx + 4 + size]
        text = payload.decode("utf-8", "replace").strip()
        if text:
            setattr(tags, attr, text)
    return tags

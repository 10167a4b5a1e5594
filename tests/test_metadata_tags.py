"""Tag extraction: hand-built container headers per format (mirrors the
reference's mutagen tag tests — ID3 TIT2/TPE1/TALB, Vorbis, MP4 atoms)."""

import struct

import numpy as np

from audio_ident_tpu.service.metadata import Tags, extract_tags

from tests.conftest import wav_bytes


def _id3_frame(fid: bytes, text: str) -> bytes:
    payload = b"\x03" + text.encode("utf-8")  # utf-8 encoding byte
    return fid + struct.pack(">I", len(payload)) + b"\x00\x00" + payload


def _id3v2_blob(title, artist, album) -> bytes:
    frames = (
        _id3_frame(b"TIT2", title)
        + _id3_frame(b"TPE1", artist)
        + _id3_frame(b"TALB", album)
    )
    size = len(frames)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + ss + frames


def test_id3v2_tags():
    blob = _id3v2_blob("Song Title", "The Artist", "An Album") + b"\xff\xfb" + b"\x00" * 64
    t = extract_tags(blob, "mp3")
    assert t == Tags(title="Song Title", artist="The Artist", album="An Album")


def test_id3_utf16_text():
    payload = b"\x01" + "Ünïcode".encode("utf-16")
    frame = b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    size = len(frame)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
    t = extract_tags(b"ID3\x03\x00\x00" + ss + frame, "mp3")
    assert t.title == "Ünïcode"


def test_riff_info_tags():
    wav = bytearray(wav_bytes(np.zeros(1600, np.float32)))
    info = b"INFO"
    for sid, val in [(b"INAM", b"Wave Song"), (b"IART", b"Wave Artist")]:
        v = val + b"\x00"
        info += sid + struct.pack("<I", len(v)) + v + (b"\x00" if len(v) & 1 else b"")
    wav += b"LIST" + struct.pack("<I", len(info)) + info
    # patch the RIFF size
    struct.pack_into("<I", wav, 4, len(wav) - 8)
    t = extract_tags(bytes(wav), "wav")
    assert t.title == "Wave Song"
    assert t.artist == "Wave Artist"


def _vorbis_comment_block(entries: list[str]) -> bytes:
    vendor = b"test"
    out = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", len(entries))
    for e in entries:
        eb = e.encode("utf-8")
        out += struct.pack("<I", len(eb)) + eb
    return out


def test_flac_vorbis_comments():
    vc = _vorbis_comment_block(["TITLE=Flac Song", "ARTIST=Flac Artist", "ALBUM=Flac Album"])
    blob = (
        b"fLaC"
        + bytes([0x00]) + len(b"\x00" * 34).to_bytes(3, "big") + b"\x00" * 34  # STREAMINFO
        + bytes([0x84]) + len(vc).to_bytes(3, "big") + vc  # last block: comments
    )
    t = extract_tags(blob, "flac")
    assert t == Tags(title="Flac Song", artist="Flac Artist", album="Flac Album")


def test_ogg_comments():
    vc = _vorbis_comment_block(["title=Ogg Song", "artist=Ogg Artist"])
    blob = b"OggS" + b"\x00" * 40 + b"\x03vorbis" + vc
    t = extract_tags(blob, "ogg")
    assert t.title == "Ogg Song"
    assert t.artist == "Ogg Artist"


def test_mp4_ilst():
    def data_atom(text: bytes) -> bytes:
        body = b"data" + struct.pack(">I", 1) + b"\x00" * 4 + text
        return struct.pack(">I", len(body) + 4) + body

    blob = (
        b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 8
        + b"\xa9nam" + data_atom(b"M4A Song")
        + b"\xa9ART" + data_atom(b"M4A Artist")
    )
    t = extract_tags(blob, "m4a")
    assert t.title == "M4A Song"
    assert t.artist == "M4A Artist"


def test_garbage_is_safe():
    assert extract_tags(b"\x00" * 100, "mp3") == Tags()
    assert extract_tags(b"", "flac") == Tags()
    assert extract_tags(b"ID3", "mp3") == Tags()

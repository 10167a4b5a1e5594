"""Host audio I/O: format sniffing, decode to PCM, blob storage, hashing.

Replaces the reference's libmagic MIME sniffing (reference:
app/routers/search.py:56,101) with built-in magic-byte checks, and its
dual-rate double-ffmpeg decode (reference: app/audio/decode.py:41-87) with
decode-once-resample-on-device: containers are decoded to their native
rate on the host, and the 48 kHz -> 16 kHz conversion happens in JAX
(ops/resample.py) so decode runs at most once per file.

Compressed-container decode order (reference spawned an ffmpeg subprocess
per file, decode.py:41-62):
1. the IN-PROCESS native codec engine (native/src/codec_engine.cc over
   libavformat/libavcodec/libswresample — no pipe, no process spawn);
2. an ffmpeg subprocess, when the binary is on PATH;
3. DecodeError.
WAV always takes the stdlib parser (no dependency at all).
"""

from __future__ import annotations

import asyncio
import hashlib
import shutil
import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

# -- format sniffing (magic bytes) --------------------------------------------

_SNIFFERS: list[tuple[str, str]] = []  # (format, mime)


def sniff_format(data: bytes) -> tuple[str, str] | None:
    """(format, mime) from magic bytes, or None if unrecognized.

    Covers the reference's allow-list: MP3, WAV, FLAC, OGG, WebM, MP4/AAC
    (reference: docs/api-contract.md search request section).
    """
    if len(data) < 12:
        return None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return ("wav", "audio/wav")
    if data[:4] == b"fLaC":
        return ("flac", "audio/flac")
    if data[:4] == b"OggS":
        return ("ogg", "audio/ogg")
    if data[:4] == b"\x1aE\xdf\xa3":
        return ("webm", "audio/webm")
    if data[4:8] == b"ftyp":
        return ("m4a", "audio/mp4")
    if data[:3] == b"ID3":
        return ("mp3", "audio/mpeg")
    if data[0] == 0xFF and (data[1] & 0xF6) == 0xF0:
        # ADTS AAC sync (0xFFF, layer 00) — a subset of the MPEG-audio
        # sync pattern, so it must be checked before the mp3 branch
        return ("aac", "audio/aac")
    if data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return ("mp3", "audio/mpeg")
    return None


MIME_BY_FORMAT = {
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "ogg": "audio/ogg",
    "webm": "audio/webm",
    "m4a": "audio/mp4",
    "aac": "audio/aac",
}


# -- decoding -------------------------------------------------------------------


class DecodeError(Exception):
    pass


@dataclass
class DecodedAudio:
    pcm: np.ndarray  # mono float32 at ``sample_rate``
    sample_rate: int
    channels: int  # channel count of the SOURCE file
    duration_seconds: float


def decode_wav(data: bytes) -> DecodedAudio:
    """Stdlib RIFF/WAVE decoder: PCM 8/16/24/32-bit int + 32/64-bit float."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise DecodeError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm_bytes = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise DecodeError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm_bytes = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm_bytes is None:
        raise DecodeError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 2:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1 if bits in (8, 16, 24, 32) else 3
    if channels < 1 or channels > 32 or sample_rate < 1000:
        raise DecodeError("implausible WAV header")
    if audio_format == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(pcm_bytes, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(pcm_bytes, "<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(pcm_bytes, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(pcm_bytes[: len(pcm_bytes) - len(pcm_bytes) % 3], np.uint8)
            raw = raw.reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
        else:
            raise DecodeError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # float
        if bits == 32:
            x = np.frombuffer(pcm_bytes, "<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(pcm_bytes, "<f8").astype(np.float32)
        else:
            raise DecodeError(f"unsupported float bit depth {bits}")
    else:
        raise DecodeError(f"unsupported WAV codec {audio_format}")
    n = (len(x) // channels) * channels
    x = x[:n].reshape(-1, channels).mean(axis=1).astype(np.float32)
    return DecodedAudio(x, sample_rate, channels, len(x) / sample_rate)


_FFMPEG = shutil.which("ffmpeg")


def have_ffmpeg() -> bool:
    return _FFMPEG is not None


async def decode_with_ffmpeg(data: bytes, target_rate: int) -> DecodedAudio:
    """Compressed containers via ffmpeg subprocess (when present),
    mirroring the reference's pipe decode (reference: decode.py:41-62)."""
    if _FFMPEG is None:
        raise DecodeError("compressed format support requires ffmpeg on PATH")
    proc = await asyncio.create_subprocess_exec(
        _FFMPEG, "-hide_banner", "-loglevel", "error",
        "-i", "pipe:0", "-f", "f32le", "-acodec", "pcm_f32le",
        "-ac", "1", "-ar", str(target_rate), "pipe:1",
        stdin=asyncio.subprocess.PIPE,
        stdout=asyncio.subprocess.PIPE,
        stderr=asyncio.subprocess.PIPE,
    )
    out, err = await proc.communicate(data)
    if proc.returncode != 0:
        raise DecodeError(f"ffmpeg failed: {err.decode(errors='replace')[:500]}")
    x = np.frombuffer(out, "<f4")
    return DecodedAudio(x.astype(np.float32), target_rate, 1, len(x) / target_rate)


def _decode_native(data: bytes, target_rate: int) -> DecodedAudio:
    from audio_ident_tpu.utils.codec_native import CodecError, decode_bytes

    try:
        pcm, rate, channels = decode_bytes(data, target_rate)
    except CodecError as exc:
        raise DecodeError(str(exc)) from exc
    return DecodedAudio(pcm, rate, channels, len(pcm) / rate)


def have_compressed_decode() -> bool:
    """True when compressed containers can be decoded at all."""
    from audio_ident_tpu.utils.codec_native import have_native_codec

    return have_native_codec() or have_ffmpeg()


async def decode_audio(data: bytes, fmt: str, target_rate: int = 48_000) -> DecodedAudio:
    """bytes + sniffed format -> mono f32 PCM (native rate for WAV)."""
    if fmt == "wav":
        return await asyncio.to_thread(decode_wav, data)
    from audio_ident_tpu.utils.codec_native import have_native_codec

    if have_native_codec():
        return await asyncio.to_thread(_decode_native, data, target_rate)
    return await decode_with_ffmpeg(data, target_rate)


# -- content-addressed blob store (reference: app/audio/storage.py:15-42) -------


def raw_audio_path(root: Path, sha256: str, fmt: str) -> Path:
    return root / "raw" / sha256[:2] / f"{sha256}.{fmt}"


def ensure_storage_dirs(root: Path) -> None:
    (root / "raw").mkdir(parents=True, exist_ok=True)


def compute_sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()

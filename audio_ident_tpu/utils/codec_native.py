"""ctypes bindings for the native codec engine (native/libaicodec.so).

The reference decodes via an ``ffmpeg`` subprocess per file (reference:
app/audio/decode.py:41-62).  This image has the ffmpeg LIBRARIES but no
CLI binary, so the engine (native/src/codec_engine.cc) links
libavformat/libavcodec/libswresample directly and we call it in-process:
no pipe, no process spawn, and the eval harness gets REAL lossy-codec
round-trips (MP3 / Opus / Vorbis / AAC) instead of the MDCT simulation.

Everything here is OPTIONAL: ``have_native_codec()`` is False when the
library isn't built and the dev libraries are absent, and callers fall
back to the ffmpeg-subprocess / codec-sim paths.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libaicodec.so"

#: codec -> (avcodec encoder name, avformat muxer name).  Covers the
#: reference's full upload allow-list (reference: docs/api-contract.md —
#: MP3, WAV, FLAC, OGG, WebM, MP4/AAC; WAV is handled by the stdlib
#: parser in service/audio.py).
ENCODERS = {
    "mp3": ("libmp3lame", "mp3"),
    "opus": ("libopus", "webm"),
    "vorbis": ("libvorbis", "ogg"),
    "aac": ("aac", "adts"),
    "m4a": ("aac", "ipod"),
    "flac": ("flac", "flac"),
}


class CodecError(Exception):
    pass


def build_native_codec() -> bool:
    """Compile the codec library (needs the ffmpeg dev libs); returns success.

    Same concurrency-safe pattern as utils/native.py: compile to a
    process-private name, then ``os.replace`` into place.
    """
    src = _NATIVE_DIR / "src" / "codec_engine.cc"
    if not src.exists():
        return False
    probe = subprocess.run(
        ["pkg-config", "--exists", "libavformat", "libavcodec",
         "libswresample", "libavutil"],
        capture_output=True,
    )
    if probe.returncode != 0:
        return False
    flags = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "libavformat", "libavcodec",
         "libswresample", "libavutil"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    tmp = _LIB_PATH.parent / f".libaicodec.{os.getpid()}.so"
    try:
        subprocess.run(
            [os.environ.get("CXX", "g++"), "-O3", "-march=native",
             "-std=c++17", "-fPIC", "-shared", "-o", str(tmp), str(src),
             *flags],
            check=True, capture_output=True, timeout=180,
        )
        os.replace(tmp, _LIB_PATH)
        codec_lib.cache_clear()
        return _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        tmp.unlink(missing_ok=True)
        return False


_AUTOBUILD_TRIED = False


def _autobuild_once() -> bool:
    global _AUTOBUILD_TRIED
    if _AUTOBUILD_TRIED:
        return _LIB_PATH.exists()
    _AUTOBUILD_TRIED = True
    return build_native_codec()


@functools.lru_cache(maxsize=1)
def codec_lib() -> ctypes.CDLL | None:
    """The loaded library, or None when unavailable.

    ``AUDIO_IDENT_NO_NATIVE_CODEC=1`` forces the fallback paths (the
    isolation switch mirroring AUDIO_IDENT_NO_NATIVE).
    """
    if os.environ.get("AUDIO_IDENT_NO_NATIVE_CODEC") == "1":
        return None
    if not _LIB_PATH.exists() and not _autobuild_once():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ai_codec_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(f32p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
    ]
    lib.ai_codec_decode.restype = ctypes.c_int64
    lib.ai_codec_encode.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.POINTER(u8p), ctypes.c_char_p, ctypes.c_int,
    ]
    lib.ai_codec_encode.restype = ctypes.c_int64
    lib.ai_codec_free.argtypes = [ctypes.c_void_p]
    lib.ai_codec_free.restype = None
    lib.ai_codec_have_encoder.argtypes = [ctypes.c_char_p]
    lib.ai_codec_have_encoder.restype = ctypes.c_int
    lib.ai_codec_version.restype = ctypes.c_char_p
    return lib


def have_native_codec() -> bool:
    return codec_lib() is not None


def have_encoder(codec: str) -> bool:
    lib = codec_lib()
    if lib is None or codec not in ENCODERS:
        return False
    return bool(lib.ai_codec_have_encoder(ENCODERS[codec][0].encode()))


def decode_bytes(data: bytes, target_rate: int = 0) -> tuple[np.ndarray, int, int]:
    """Compressed bytes -> (mono f32 PCM, sample_rate, source_channels).

    ``target_rate`` 0 keeps the container's native rate; otherwise
    swresample converts in-process.
    """
    lib = codec_lib()
    if lib is None:
        raise CodecError("native codec engine unavailable")
    out_pcm = ctypes.POINTER(ctypes.c_float)()
    out_rate = ctypes.c_int(0)
    out_ch = ctypes.c_int(0)
    err = ctypes.create_string_buffer(512)
    n = lib.ai_codec_decode(
        data, len(data), target_rate,
        ctypes.byref(out_pcm), ctypes.byref(out_rate), ctypes.byref(out_ch),
        err, len(err),
    )
    if n < 0:
        raise CodecError(err.value.decode(errors="replace") or "decode failed")
    try:
        pcm = np.ctypeslib.as_array(out_pcm, shape=(n,)).copy()
    finally:
        lib.ai_codec_free(out_pcm)
    return pcm, out_rate.value, out_ch.value


def encode_pcm(
    pcm: np.ndarray, sample_rate: int, codec: str, bitrate_kbps: int = 0
) -> bytes:
    """Mono f32 PCM -> muxed compressed bytes (see ``ENCODERS``)."""
    lib = codec_lib()
    if lib is None:
        raise CodecError("native codec engine unavailable")
    if codec not in ENCODERS:
        raise CodecError(f"unknown codec {codec!r}")
    enc, fmt = ENCODERS[codec]
    x = np.ascontiguousarray(pcm, np.float32)
    out = ctypes.POINTER(ctypes.c_uint8)()
    err = ctypes.create_string_buffer(512)
    n = lib.ai_codec_encode(
        x, len(x), sample_rate, enc.encode(), fmt.encode(),
        bitrate_kbps * 1000, ctypes.byref(out), err, len(err),
    )
    if n < 0:
        raise CodecError(err.value.decode(errors="replace") or "encode failed")
    try:
        data = ctypes.string_at(out, n)
    finally:
        lib.ai_codec_free(out)
    return data

"""Lossy-codec round-trips for evaluation: real codecs, or an MDCT sim.

The reference's eval encodes clips through real Opus/MP3 to measure
browser-capture accuracy (reference: scripts/build_eval_corpus.py:153-188,
scripts/eval_exact.py:48).  Three paths, in preference order:

- the NATIVE codec engine (native/src/codec_engine.cc linking
  libavformat/libavcodec/libswresample in-process): REAL libopus /
  libmp3lame / libvorbis / aac round-trips with no subprocess — this
  image ships the ffmpeg libraries without the CLI binary;
- ``ffmpeg_roundtrip``: pipes PCM through the ffmpeg binary when it IS
  on PATH (equivalent output, kept for hosts without the dev libs);
- ``codec_sim``: an honest transform-domain simulation of perceptual
  codecs — MDCT analysis, per-band bit allocation against a real bit
  budget derived from the target bitrate, uniform quantization of the
  kept coefficients, bandwidth truncation, overlap-add synthesis.  It
  reproduces the artifact classes that break fingerprinting (quantization
  noise shaped by the signal, dropped high bands, pre-echo) without
  claiming to BE Opus/MP3; corpora built with it are labeled
  ``*-sim`` so reports can never pass it off as a real codec.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np

# ---------------------------------------------------------------------------
# Real codecs via ffmpeg (when present)
# ---------------------------------------------------------------------------

_FFMPEG = shutil.which("ffmpeg")

#: codec name -> (ffmpeg encoder, container format)
FFMPEG_CODECS = {
    "opus": ("libopus", "webm"),
    "mp3": ("libmp3lame", "mp3"),
    "aac": ("aac", "adts"),
}


def have_ffmpeg() -> bool:
    return _FFMPEG is not None


def ffmpeg_encode(pcm: np.ndarray, sr: int, codec: str, bitrate_kbps: int) -> bytes:
    """Encode mono f32 PCM to compressed bytes (container per codec)."""
    if _FFMPEG is None:
        raise RuntimeError("ffmpeg not on PATH")
    enc, fmt = FFMPEG_CODECS[codec]
    proc = subprocess.run(
        [
            _FFMPEG, "-v", "error",
            "-f", "f32le", "-ar", str(sr), "-ac", "1", "-i", "pipe:0",
            "-c:a", enc, "-b:a", f"{bitrate_kbps}k", "-f", fmt, "pipe:1",
        ],
        input=np.asarray(pcm, np.float32).tobytes(),
        capture_output=True,
        check=True,
    )
    return proc.stdout


def ffmpeg_decode(data: bytes, sr: int) -> np.ndarray:
    """Decode compressed bytes back to mono f32 PCM at ``sr``."""
    if _FFMPEG is None:
        raise RuntimeError("ffmpeg not on PATH")
    proc = subprocess.run(
        [
            _FFMPEG, "-v", "error", "-i", "pipe:0",
            "-f", "f32le", "-ar", str(sr), "-ac", "1", "pipe:1",
        ],
        input=data,
        capture_output=True,
        check=True,
    )
    return np.frombuffer(proc.stdout, np.float32)


def _align_to_input(out: np.ndarray, pcm: np.ndarray, sr: int) -> np.ndarray:
    """Trim/pad a decoded round-trip to the input length, aligning by
    cross-correlation (codecs add priming/padding samples)."""
    n = len(pcm)
    if len(out) >= n:
        # codecs prepend priming samples; align by cross-correlating the
        # first second rather than blindly trimming the head
        head = min(sr, n)
        lag_max = min(len(out) - head, 4096)
        if lag_max > 0:
            ref = pcm[:head]
            corr = [
                float(np.dot(out[k : k + head], ref)) for k in range(0, lag_max, 16)
            ]
            k0 = int(np.argmax(corr)) * 16
        else:
            k0 = 0
        out = out[k0 : k0 + n]
    if len(out) < n:
        out = np.pad(out, (0, n - len(out)))
    return out.astype(np.float32)


def ffmpeg_roundtrip(
    pcm: np.ndarray, sr: int, codec: str = "opus", bitrate_kbps: int = 48
) -> np.ndarray:
    """Real encode->decode through the ffmpeg binary."""
    out = ffmpeg_decode(ffmpeg_encode(pcm, sr, codec, bitrate_kbps), sr)
    return _align_to_input(out, pcm, sr)


def native_roundtrip(
    pcm: np.ndarray, sr: int, codec: str = "opus", bitrate_kbps: int = 48
) -> np.ndarray:
    """Real encode->decode through the in-process native codec engine."""
    from audio_ident_tpu.utils.codec_native import decode_bytes, encode_pcm

    data = encode_pcm(np.asarray(pcm, np.float32), sr, codec, bitrate_kbps)
    out, _rate, _ch = decode_bytes(data, target_rate=sr)
    return _align_to_input(out, pcm, sr)


def have_native_codecs() -> bool:
    from audio_ident_tpu.utils.codec_native import have_encoder, have_native_codec

    return have_native_codec() and all(
        have_encoder(c) for c in ("opus", "mp3", "aac")
    )


# ---------------------------------------------------------------------------
# MDCT codec simulation (no external binaries)
# ---------------------------------------------------------------------------


def _mdct_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward/inverse MDCT bases for frame length ``n`` (hop n//2).

    MDCT: X[k] = sum_j w[j] x[j] cos(pi/M (j + 0.5 + M/2)(k + 0.5)),
    M = n/2, with the sine window w satisfying Princen-Bradley so
    overlap-add of the inverse reconstructs exactly.
    """
    m = n // 2
    j = np.arange(n, dtype=np.float64)
    k = np.arange(m, dtype=np.float64)
    win = np.sin(np.pi / n * (j + 0.5))
    basis = np.cos(np.pi / m * (j[:, None] + 0.5 + m / 2.0) * (k[None, :] + 0.5))
    fwd = (win[:, None] * basis).astype(np.float32)  # [n, M]
    inv = (2.0 / m) * (win[:, None] * basis).astype(np.float32)  # [n, M]
    return fwd, inv


_MDCT_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def mdct(x: np.ndarray, n: int = 1024) -> np.ndarray:
    """[num_frames, n//2] MDCT coefficients (50% overlap, sine window)."""
    if n not in _MDCT_CACHE:
        _MDCT_CACHE[n] = _mdct_matrices(n)
    fwd, _ = _MDCT_CACHE[n]
    m = n // 2
    # pad half a frame on both ends so OLA covers the signal
    pad = np.concatenate([np.zeros(m, np.float32), x, np.zeros(n, np.float32)])
    num = (len(pad) - n) // m + 1
    frames = np.lib.stride_tricks.sliding_window_view(pad, n)[::m][:num]
    return frames @ fwd  # [F, M]


def imdct(coefs: np.ndarray, n: int, length: int) -> np.ndarray:
    """Overlap-add inverse of :func:`mdct`, trimmed to ``length``."""
    if n not in _MDCT_CACHE:
        _MDCT_CACHE[n] = _mdct_matrices(n)
    _, inv = _MDCT_CACHE[n]
    m = n // 2
    frames = coefs @ inv.T  # [F, n]
    out = np.zeros(m * (len(coefs) - 1) + n, np.float32)
    for i, fr in enumerate(frames):
        out[i * m : i * m + n] += fr
    return out[m : m + length]


def _band_edges(m: int, n_bands: int) -> np.ndarray:
    """Bark-ish band edges: geometric spacing, min 4 bins per band."""
    edges = np.unique(
        np.round(np.geomspace(4, m, n_bands)).astype(int)
    )
    return np.concatenate([[0], edges])


def codec_sim(
    pcm: np.ndarray,
    sr: int = 16000,
    bitrate_kbps: int = 48,
    frame: int = 1024,
    n_bands: int = 24,
) -> np.ndarray:
    """Perceptual-codec SIMULATION: MDCT + bit-budgeted band quantization.

    Per frame, a real bit budget (``bitrate_kbps`` over the hop duration)
    is allocated across bark-spaced bands by a water-filling rule on log
    band energy; bands that win no bits are zeroed (bandwidth/detail
    loss), the rest are uniformly quantized with step sizes implied by
    their bit share (quantization noise).  Deterministic — no dither.
    """
    x = np.asarray(pcm, np.float32)
    coefs = mdct(x, frame)  # [F, M]
    m = frame // 2
    edges = _band_edges(m, n_bands)
    nb = len(edges) - 1
    hop_sec = m / sr
    # Real codecs spend their bit budget through entropy coding and
    # psychoacoustic noise shaping, reaching a given quality at roughly
    # 2-3x fewer raw uniform-quantization bits than this sim's direct
    # allocation.  Without the gain factor the sim at 24 kbps measured
    # ~9.6 dB output SNR — far below real Opus at that rate — making
    # "opus-sim@24k" eval rows unrealistically punishing.  2.5 calibrates
    # the severity into the plausible range while keeping the artifact
    # CLASSES (band dropping, quantization noise, pre-echo) intact.
    coding_gain = 2.5
    budget = bitrate_kbps * 1000.0 * hop_sec * coding_gain  # bits per frame
    budget = max(budget - 32.0 * nb, 64.0)  # header/scalefactor overhead

    out = np.zeros_like(coefs)
    band_sizes = np.diff(edges)
    for f in range(coefs.shape[0]):
        c = coefs[f]
        energies = np.array(
            [float(np.mean(c[a:b] ** 2)) + 1e-12 for a, b in zip(edges[:-1], edges[1:])]
        )
        # water-filling on log energy: bits_i ∝ max(log2 E_i - lam, 0),
        # lam chosen by bisection so sum bits*size == budget
        log_e = np.log2(energies)
        lo, hi = log_e.min() - 32.0, log_e.max() + 1.0
        for _ in range(40):
            lam = 0.5 * (lo + hi)
            bits = np.maximum(log_e - lam, 0.0) / 2.0  # bits per coeff
            if float(bits @ band_sizes) > budget:
                lo = lam  # over budget -> raise the water level
            else:
                hi = lam
        bits = np.maximum(log_e - hi, 0.0) / 2.0  # hi is always under budget
        for i, (a, b) in enumerate(zip(edges[:-1], edges[1:])):
            if bits[i] < 0.5:
                continue  # band dropped
            scale = float(np.max(np.abs(c[a:b]))) or 1.0
            levels = 2.0 ** min(bits[i], 15.0)
            step = 2.0 * scale / levels
            out[f, a:b] = np.round(c[a:b] / step) * step
    return imdct(out, frame, len(x))


def roundtrip(
    pcm: np.ndarray, sr: int = 16000, codec: str = "opus", bitrate_kbps: int = 48
) -> tuple[np.ndarray, str]:
    """Best-available codec round-trip: (pcm, provenance_label).

    A REAL codec when reachable — the in-process native engine first
    (label ``opus@48k``), the ffmpeg binary second (same label) — and
    the MDCT simulation last (label ``opus-sim@48k``); the label lands
    in the corpus ground truth so eval reports carry honest provenance.
    """
    from audio_ident_tpu.utils.codec_native import have_encoder

    if have_encoder(codec):
        return (
            native_roundtrip(pcm, sr, codec, bitrate_kbps),
            f"{codec}@{bitrate_kbps}k",
        )
    if have_ffmpeg():
        return (
            ffmpeg_roundtrip(pcm, sr, codec, bitrate_kbps),
            f"{codec}@{bitrate_kbps}k",
        )
    return codec_sim(pcm, sr, bitrate_kbps), f"{codec}-sim@{bitrate_kbps}k"

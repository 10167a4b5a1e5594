"""Degradation + codec round-trip tests (VERDICT r1 missing #3/#8).

Covers the MDCT codec simulator (perfect reconstruction without
quantization, monotone quality vs bitrate), calibrated-SNR noise, the
capture chains, REAL ffmpeg Opus/MP3 round-trips when ffmpeg is on PATH
(mirrors reference: tests/test_audio_decode.py:18-45 — skipped otherwise),
and the property that actually matters: a degraded clip still identifies
against the index, i.e. the eval can FAIL.
"""

import numpy as np
import pytest

from audio_ident_tpu.eval.codecs import (
    codec_sim,
    ffmpeg_roundtrip,
    have_ffmpeg,
    imdct,
    mdct,
    roundtrip,
)
from audio_ident_tpu.eval.degrade import (
    add_noise_snr,
    browser_capture_chain,
    make_noise,
    mic_capture_chain,
)
from audio_ident_tpu.index.match import DeviceIndex
from audio_ident_tpu.index.store import FingerprintIndex
from audio_ident_tpu.search.exact import ExactLane

from tests.conftest import synth_audio


def _snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = ref - test
    return 10 * np.log10(float(np.mean(ref**2)) / (float(np.mean(err**2)) + 1e-12))


# -- MDCT ---------------------------------------------------------------------


def test_mdct_perfect_reconstruction(rng):
    x = synth_audio(rng, 3.0)
    y = imdct(mdct(x, 1024), 1024, len(x))
    assert np.max(np.abs(x - y)) < 1e-5


def test_mdct_length_preserved(rng):
    for n in (16000, 16001, 16384 + 511):
        x = rng.standard_normal(n).astype(np.float32)
        assert len(imdct(mdct(x, 512), 512, n)) == n


# -- codec sim ------------------------------------------------------------------


def test_codec_sim_quality_monotone_in_bitrate(rng):
    x = synth_audio(np.random.default_rng(5), 4.0)
    snrs = [_snr_db(x, codec_sim(x, 16000, br)) for br in (96, 48, 16)]
    assert snrs[0] > snrs[1] > snrs[2]
    assert snrs[0] > 35.0  # near-transparent at high bitrate
    assert snrs[2] < 20.0  # audible damage at low bitrate


def test_codec_sim_deterministic():
    x = synth_audio(np.random.default_rng(6), 2.0)
    assert np.array_equal(codec_sim(x, 16000, 48), codec_sim(x, 16000, 48))


def test_roundtrip_label_provenance():
    from audio_ident_tpu.utils.codec_native import have_encoder

    x = synth_audio(np.random.default_rng(7), 2.0)
    out, label = roundtrip(x, 16000, "opus", 48)
    assert len(out) == len(x)
    if have_encoder("opus") or have_ffmpeg():
        assert label == "opus@48k"  # a REAL codec ran (native engine or CLI)
    else:
        assert label == "opus-sim@48k"  # sim NEVER masquerades as real


# -- noise ----------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["white", "pink", "babble"])
def test_noise_unit_power(kind, rng):
    nz = make_noise(kind, 32000, rng)
    assert abs(float(np.mean(nz**2)) - 1.0) < 1e-3


def test_add_noise_snr_calibrated(rng):
    x = synth_audio(np.random.default_rng(8), 4.0)
    y = add_noise_snr(x, 10.0, np.random.default_rng(9), "white")
    # measured SNR == requested (within clipping-normalization slack)
    assert abs(_snr_db(x, y) - 10.0) < 1.5


def test_capture_chains_shape_and_range(rng):
    x = synth_audio(np.random.default_rng(10), 4.0)
    for y in (mic_capture_chain(x, np.random.default_rng(11)),
              browser_capture_chain(x, np.random.default_rng(12))):
        assert y.shape == x.shape and y.dtype == np.float32
        assert float(np.max(np.abs(y))) <= 1.0


# -- end-to-end: degraded clips still identify (the falsifiable property) -------


@pytest.fixture(scope="module")
def lane_and_tracks():
    idx = FingerprintIndex(max_tracks=16)
    clips = [synth_audio(np.random.default_rng(100 + i), 20.0) for i in range(4)]
    from audio_ident_tpu import spec
    from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np

    for i, c in enumerate(clips):
        h, t, v = fingerprint_np(c, spec.max_peaks(len(c)))
        idx.add_track(f"{i:032x}", h[v].astype(np.int64), t[v], np.ones(v.sum(), bool))
    idx.flush()
    return ExactLane(DeviceIndex.from_host(idx)), clips


def test_codec_sim_clip_still_identifies(lane_and_tracks):
    lane, clips = lane_and_tracks
    q = codec_sim(clips[1][16000 * 2 : 16000 * 10], 16000, 48)
    res = lane.search(q)
    assert res and res[0].track_row == 1


def test_noisy_clip_still_identifies_at_10db(lane_and_tracks):
    lane, clips = lane_and_tracks
    q = add_noise_snr(clips[2][16000 * 3 : 16000 * 11], 10.0,
                      np.random.default_rng(55), "pink")
    res = lane.search(q)
    assert res and res[0].track_row == 2


def test_0db_white_noise_hurts_but_does_not_false_positive(lane_and_tracks):
    lane, clips = lane_and_tracks
    q = add_noise_snr(clips[3][16000 * 2 : 16000 * 10], 0.0,
                      np.random.default_rng(56), "white")
    res = lane.search(q)
    # may or may not identify at 0 dB — but must never return a WRONG track
    assert not res or res[0].track_row == 3


# -- real codecs (native engine preferred, ffmpeg CLI fallback;
#    reference: tests/test_audio_decode.py) ---------------------------------

from audio_ident_tpu.eval.codecs import native_roundtrip  # noqa: E402
from audio_ident_tpu.utils.codec_native import (  # noqa: E402
    encode_pcm,
    have_encoder,
)


def _have_real(codec: str) -> bool:
    return have_encoder(codec) or have_ffmpeg()


def _real_roundtrip(pcm, sr, codec, bitrate):
    if have_encoder(codec):
        return native_roundtrip(pcm, sr, codec, bitrate)
    return ffmpeg_roundtrip(pcm, sr, codec, bitrate)


needs_real = pytest.mark.skipif(
    not (_have_real("opus") and _have_real("mp3")),
    reason="no real codec engine (native libs or ffmpeg CLI)",
)


@needs_real
@pytest.mark.parametrize("codec,bitrate", [("opus", 48), ("mp3", 64)])
def test_real_codec_roundtrip_identifies(lane_and_tracks, codec, bitrate):
    lane, clips = lane_and_tracks
    q = _real_roundtrip(clips[0][16000 * 2 : 16000 * 10], 16000, codec, bitrate)
    res = lane.search(q)
    assert res and res[0].track_row == 0


@needs_real
def test_real_opus_bytes_decode_through_service():
    """Compressed bytes land in the service decode path (WebM/Opus is the
    browser-capture format — reference: scripts/eval_exact.py:48)."""
    import asyncio

    from audio_ident_tpu.service.audio import decode_audio, sniff_format

    x = synth_audio(np.random.default_rng(13), 4.0)
    if have_encoder("opus"):
        data = encode_pcm(x, 16000, "opus", 48)
    else:
        from audio_ident_tpu.eval.codecs import ffmpeg_encode

        data = ffmpeg_encode(x, 16000, "opus", 48)
    fmt, _mime = sniff_format(data)
    assert fmt == "webm"
    decoded = asyncio.run(decode_audio(data, fmt, target_rate=16000))
    assert abs(len(decoded.pcm) * 16000 // decoded.sample_rate - len(x)) < 16000

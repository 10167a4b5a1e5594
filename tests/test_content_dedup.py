"""Content-dedup fingerprint: CPU/JAX parity, robustness, similarity math,
and the service-level near-duplicate rejection (reference behavior:
dedup.py phase-2 ±10% duration window + 0.85 threshold)."""

import numpy as np
import pytest
import httpx

from audio_ident_tpu import spec
from audio_ident_tpu.ops.content_fp import (
    content_fingerprint_jax,
    content_fingerprint_np,
    decode_fingerprint,
    encode_fingerprint,
    fingerprint_similarity,
    is_content_duplicate,
)

from tests.conftest import synth_audio, wav_bytes


def test_cpu_jax_parity():
    x = synth_audio(np.random.default_rng(1), 8.0)
    a = content_fingerprint_np(x)
    b = np.asarray(content_fingerprint_jax(x))
    assert len(a) == len(b) > 100
    # float noise may flip a handful of near-zero difference bits
    assert fingerprint_similarity(a, b) > 0.999


def test_self_similarity_and_transcode_robustness():
    """Phase-2 dedup targets TRANSCODES of the same content (format/gain/
    dither changes), not noisy re-records — those are the exact lane's job
    (reference scopes Chromaprint to ingestion-time dedup only,
    app/models/track.py:34)."""
    x = synth_audio(np.random.default_rng(2), 10.0)
    fp = content_fingerprint_np(x)
    assert fingerprint_similarity(fp, fp) == 1.0
    # gain change: energies scale, difference SIGNS are invariant
    assert fingerprint_similarity(fp, content_fingerprint_np(0.7 * x)) == 1.0
    # 16-bit requantization + dither (wav<->wav transcode)
    q = np.round(x * 32767.0) / 32767.0
    q = (q + 1.5e-4 * np.sign(np.random.default_rng(3).standard_normal(len(x)))).astype(np.float32)
    assert fingerprint_similarity(fp, content_fingerprint_np(q)) >= spec.CFP_SIMILARITY_THRESHOLD


def test_different_audio_low_similarity():
    a = content_fingerprint_np(synth_audio(np.random.default_rng(4), 10.0))
    b = content_fingerprint_np(synth_audio(np.random.default_rng(5), 10.0))
    assert fingerprint_similarity(a, b) < spec.CFP_SIMILARITY_THRESHOLD


def test_encode_decode_roundtrip():
    fp = np.array([0, 1, 0xFFFFFFFF, 12345], np.uint32)
    np.testing.assert_array_equal(decode_fingerprint(encode_fingerprint(fp)), fp)


def test_is_content_duplicate_duration_window():
    x = synth_audio(np.random.default_rng(6), 10.0)
    fp = content_fingerprint_np(x)
    hexfp = encode_fingerprint(fp)
    # same fp, duration outside ±10% -> not a dup
    assert is_content_duplicate(fp, 10.0, [("t1", hexfp, 12.0)]) is None
    # inside the window -> dup
    got = is_content_duplicate(fp, 10.0, [("t1", hexfp, 10.5)])
    assert got is not None and got[0] == "t1" and got[1] == 1.0


def test_empty_and_short_input():
    assert len(content_fingerprint_np(np.zeros(100, np.float32))) == 0
    assert fingerprint_similarity(np.zeros(0, np.uint32), np.zeros(0, np.uint32)) == 0.0


# -- service-level -------------------------------------------------------------

pytestmark_async = pytest.mark.anyio


@pytest.mark.anyio
async def test_service_rejects_transcoded_duplicate(tmp_path):
    """Same audio at a different bit depth / slight noise = same content:
    phase-1 SHA misses it, phase-2 must catch it."""
    from audio_ident_tpu.service.app import create_app
    from audio_ident_tpu.service.catalog import Catalog
    from audio_ident_tpu.service.settings import Settings
    from audio_ident_tpu.service.state import EngineState

    settings = Settings(
        data_root=str(tmp_path / "d"), admin_api_key="k",
        max_tracks=1 << 12, exact_timeout_sec=300.0, vibe_timeout_sec=300.0,
    )
    app = create_app(
        settings, catalog=Catalog(":memory:"),
        engine=EngineState(max_tracks=1 << 12),
    )
    pcm = synth_audio(np.random.default_rng(7), 8.0)
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    ) as c:
        r = await c.post(
            "/api/v1/ingest",
            files={"audio": ("a.wav", wav_bytes(pcm), "audio/wav")},
            headers={"x-admin-key": "k"},
        )
        assert r.status_code == 201
        first_id = r.json()["track_id"]
        # transcoded twin: tiny dither changes the file hash, not the content
        dithered = pcm + np.float32(1.5e-4) * np.sign(
            np.random.default_rng(8).standard_normal(len(pcm))
        ).astype(np.float32)
        r2 = await c.post(
            "/api/v1/ingest",
            files={"audio": ("a_recode.wav", wav_bytes(dithered), "audio/wav")},
            headers={"x-admin-key": "k"},
        )
        assert r2.status_code == 200, r2.text
        assert r2.json()["status"] == "duplicate"
        assert r2.json()["track_id"] == first_id

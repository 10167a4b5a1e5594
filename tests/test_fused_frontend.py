"""Fused Pallas front-end (PCM -> DFT -> peaks in one kernel): bit parity
with the XLA path and the NumPy golden, across tile counts and clip edges.

Runs the kernel in interpreter mode on the CPU test backend; the same code
compiles via Mosaic on the real chip (exercised by bench.py and the
on-chip eval).  Mirrors the reference's golden-parity test strategy for
its external fingerprint engine (reference:
audio-ident-service/tests/test_audio_fingerprint.py:33-60 — ours tests
real math instead of mocked subprocess output).
"""

import numpy as np
import pytest

from audio_ident_tpu import spec
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
from audio_ident_tpu.ops.fingerprint import fingerprint_batch
from audio_ident_tpu.ops.fused_frontend import plan_tiles

from tests.conftest import synth_audio


@pytest.mark.parametrize("seconds", [4.0, 10.0])
def test_fused_matches_xla_and_golden(seconds):
    x = synth_audio(np.random.default_rng(77), seconds)
    budget = spec.max_peaks(len(x))

    h_x, t_x, v_x = (np.asarray(a)[0] for a in fingerprint_batch(x[None], budget))
    h_p, t_p, v_p = (
        np.asarray(a)[0]
        for a in fingerprint_batch(
            x[None], budget, use_pallas=True, pallas_interpret=True
        )
    )
    assert set(zip(h_p[v_p].tolist(), t_p[v_p].tolist())) == set(
        zip(h_x[v_x].tolist(), t_x[v_x].tolist())
    )

    h_n, t_n, v_n = fingerprint_np(x, budget)
    assert set(zip(h_p[v_p].tolist(), t_p[v_p].tolist())) == set(
        zip(h_n[v_n].tolist(), t_n[v_n].tolist())
    )


def test_fused_multi_tile_matches_xla():
    # long enough that the grid uses >1 frame tile: halo rows must see true
    # neighbor values, not tile-local padding
    from audio_ident_tpu.ops.fused_frontend import MAX_TILE

    seconds = (spec.num_frames(0) + MAX_TILE + 200) * spec.HOP / spec.SAMPLE_RATE + 1
    x = synth_audio(np.random.default_rng(78), seconds)
    n_tiles, _ = plan_tiles(spec.num_frames(len(x)))
    assert n_tiles >= 2
    budget = spec.max_peaks(len(x))
    h_x, t_x, v_x = (np.asarray(a)[0] for a in fingerprint_batch(x[None], budget))
    h_p, t_p, v_p = (
        np.asarray(a)[0]
        for a in fingerprint_batch(
            x[None], budget, use_pallas=True, pallas_interpret=True
        )
    )
    assert set(zip(h_p[v_p].tolist(), t_p[v_p].tolist())) == set(
        zip(h_x[v_x].tolist(), t_x[v_x].tolist())
    )


def test_fused_batch_consistency():
    # batch grid dimension: each clip's output independent of batch position
    rng = np.random.default_rng(79)
    clips = np.stack([synth_audio(rng, 4.0) for _ in range(3)])
    budget = spec.max_peaks(clips.shape[1])
    h_b, t_b, v_b = (
        np.asarray(a)
        for a in fingerprint_batch(
            clips, budget, use_pallas=True, pallas_interpret=True
        )
    )
    for i in range(3):
        h_1, t_1, v_1 = (
            np.asarray(a)[0]
            for a in fingerprint_batch(
                clips[i][None], budget, use_pallas=True, pallas_interpret=True
            )
        )
        np.testing.assert_array_equal(h_b[i][v_b[i]], h_1[v_1])
        np.testing.assert_array_equal(t_b[i][v_b[i]], t_1[v_1])


def test_plan_tiles_covers_all_buckets():
    for sec in spec.QUERY_BUCKETS_SEC + spec.INGEST_BUCKETS_SEC:
        t = spec.num_frames(sec * spec.SAMPLE_RATE)
        n, tt = plan_tiles(t)
        assert n * tt >= t
        assert tt % 8 == 0
        # stage-2 packed flat index must stay within its 20-bit budget
        assert n * tt * spec.PEAKS_PER_FRAME_CAP < (1 << 20)

"""Fused Pallas front-end: bit parity with the XLA path and the NumPy
golden (runs the kernel in interpreter mode on the CPU test backend)."""

import numpy as np
import pytest

from audio_ident_tpu import spec
from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
from audio_ident_tpu.ops.fingerprint import fingerprint_batch

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
    np.testing.assert_array_equal(v_p, v_x)
    np.testing.assert_array_equal(h_p[v_p], h_x[v_x])
    np.testing.assert_array_equal(t_p[v_p], t_x[v_x])

    h_n, t_n, v_n = fingerprint_np(x, budget)
    assert set(zip(h_p[v_p].tolist(), t_p[v_p].tolist())) == set(
        zip(h_n[v_n].tolist(), t_n[v_n].tolist())
    )


def test_long_clip_falls_back():
    # beyond MAX_FUSED_FRAMES the pallas flag must transparently fall back
    from audio_ident_tpu.ops.pallas_frontend import MAX_FUSED_FRAMES

    seconds = (MAX_FUSED_FRAMES + 100) * spec.HOP / spec.SAMPLE_RATE
    x = synth_audio(np.random.default_rng(78), seconds)
    budget = spec.max_peaks(len(x))
    h_x, t_x, v_x = (np.asarray(a)[0] for a in fingerprint_batch(x[None], budget))
    h_p, t_p, v_p = (
        np.asarray(a)[0]
        for a in fingerprint_batch(
            x[None], budget, use_pallas=True, pallas_interpret=True
        )
    )
    np.testing.assert_array_equal(h_p[v_p], h_x[v_x])

"""CPU-golden vs JAX fingerprint parity (SURVEY.md §4 technique 6/§7 part 1).

The NumPy implementation is the oracle; the JAX path must produce the same
hash multiset and anchor times.  Run on the CPU backend here; the TPU bench
re-checks parity on hardware (bench.py).
"""

import numpy as np
import pytest

# <5 min smoke tier: `make test-fast` / pytest -m fast (r3 verdict item 9)
pytestmark = pytest.mark.fast

from audio_ident_tpu import spec
from audio_ident_tpu.cpu_reference.fingerprint import (
    fingerprint_np,
    frame_signal,
    log_magnitude,
    quantized_salience,
    select_peaks,
)
from audio_ident_tpu.ops.fingerprint import fingerprint_batch
from audio_ident_tpu.ops.resample import resample_48k_to_16k, resample_48k_to_16k_np

from tests.conftest import synth_audio


def _hash_set(hashes, times, valid):
    return set(zip(hashes[valid].tolist(), times[valid].tolist()))


@pytest.mark.parametrize("seconds", [4.0, 10.0])
def test_fingerprint_hash_parity(seconds):
    rng = np.random.default_rng(42)
    x = synth_audio(rng, seconds)
    budget = spec.max_peaks(len(x))

    h_np, t_np, v_np = fingerprint_np(x, budget)
    h_j, t_j, v_j = fingerprint_batch(x[None, :], budget)
    h_j, t_j, v_j = np.asarray(h_j[0]), np.asarray(t_j[0]), np.asarray(v_j[0])

    set_np = _hash_set(h_np, t_np, v_np)
    set_j = _hash_set(h_j, t_j, v_j)
    assert len(set_np) > 50, "golden path produced too few hashes"
    # decision quantization should make the two paths agree exactly on CPU
    only_np = set_np - set_j
    only_j = set_j - set_np
    overlap = len(set_np & set_j) / max(len(set_np | set_j), 1)
    assert overlap >= 0.995, f"hash overlap {overlap:.4f}; np-only={len(only_np)} jax-only={len(only_j)}"


def test_fingerprint_deterministic():
    rng = np.random.default_rng(7)
    x = synth_audio(rng, 5.0)
    budget = spec.max_peaks(len(x))
    a = fingerprint_np(x, budget)
    b = fingerprint_np(x.copy(), budget)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[2], b[2])


def test_peak_budget_and_masks():
    rng = np.random.default_rng(3)
    x = synth_audio(rng, 6.0)
    budget = spec.max_peaks(len(x))
    q = quantized_salience(log_magnitude(frame_signal(x)))
    peaks = select_peaks(q, budget)
    k = peaks.valid.sum()
    assert 0 < k <= budget
    # valid peaks sorted by (t, f)
    keys = peaks.t[peaks.valid].astype(np.int64) * 1024 + peaks.f[peaks.valid]
    assert np.all(np.diff(keys) > 0)


def test_hash_fits_24_bits():
    rng = np.random.default_rng(11)
    x = synth_audio(rng, 5.0)
    h, _, v = fingerprint_np(x, spec.max_peaks(len(x)))
    assert h[v].max() < spec.HASH_SPACE
    assert h[v].min() >= 0


def test_empty_and_short_audio():
    h, t, v = fingerprint_np(np.zeros(100, dtype=np.float32), 16)
    assert not v.any()


def test_resample_parity():
    rng = np.random.default_rng(5)
    x48 = synth_audio(rng, 3.0, sr=48000)
    y_np = resample_48k_to_16k_np(x48)
    y_j = np.asarray(resample_48k_to_16k(x48))
    assert y_np.shape == y_j.shape == (len(x48) // 3,)
    np.testing.assert_allclose(y_np, y_j, rtol=0, atol=2e-6)


def test_resampled_audio_fingerprints_match_direct_16k():
    """Fingerprints of device-resampled audio must be consistent CPU vs JAX."""
    rng = np.random.default_rng(9)
    x48 = synth_audio(rng, 4.0, sr=48000)
    x16_np = resample_48k_to_16k_np(x48)
    budget = spec.max_peaks(len(x16_np))
    h_np, t_np, v_np = fingerprint_np(x16_np, budget)
    h_j, t_j, v_j = fingerprint_batch(np.asarray(resample_48k_to_16k(x48))[None], budget)
    set_np = _hash_set(h_np, t_np, v_np)
    set_j = _hash_set(np.asarray(h_j[0]), np.asarray(t_j[0]), np.asarray(v_j[0]))
    overlap = len(set_np & set_j) / max(len(set_np | set_j), 1)
    assert overlap >= 0.99

"""CLAP JAX-vs-torch numerical parity (SURVEY.md §7 hard part 5).

No checkpoint is downloadable in this environment, so parity runs against
randomly-initialized torch twins: if the architecture math matches on
random weights (cosine ~ 1.0, small atol), a real checkpoint ports
identically.  Feature extraction is compared against the HF extractor's
NumPy output directly.
"""

import numpy as np
import pytest

from audio_ident_tpu.models.clap.htsat import ClapAudioConfig, audio_embed
from audio_ident_tpu.models.clap.port import init_random_params

SMALL = ClapAudioConfig(
    spec_size=64,
    num_mel_bins=16,
    window_size=4,
    depths=(2, 2),
    num_heads=(2, 4),
    patch_embeds_hidden_size=16,
    hidden_size=32,
    projection_dim=32,
)


def _torch_embed(model, mel):
    import torch

    with torch.no_grad():
        out = model(input_features=torch.from_numpy(mel[:, None]).float())
        e = out.audio_embeds
        return (e / e.norm(dim=-1, keepdim=True)).numpy()


@pytest.mark.parametrize("t_in", [64 * 4, 250])  # exact-size and interpolated
def test_htsat_small_parity(t_in):
    params, model = init_random_params(SMALL, seed=3)
    rng = np.random.default_rng(0)
    mel = rng.normal(-20.0, 15.0, (3, t_in, SMALL.num_mel_bins)).astype(np.float32)
    ours = np.asarray(audio_embed(params, SMALL, mel))
    theirs = _torch_embed(model, mel)
    cos = np.sum(ours * theirs, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.slow
def test_htsat_default_config_parity():
    cfg = ClapAudioConfig()  # full-size default (HTSAT base, 4 stages)
    params, model = init_random_params(cfg, seed=4)
    rng = np.random.default_rng(1)
    mel = rng.normal(-25.0, 12.0, (1, 1001, 64)).astype(np.float32)
    ours = np.asarray(audio_embed(params, cfg, mel))
    theirs = _torch_embed(model, mel)
    cos = float(np.sum(ours * theirs, axis=-1)[0])
    assert cos > 1.0 - 1e-5, cos


def test_log_mel_features_match_hf_extractor():
    from transformers import ClapFeatureExtractor

    from audio_ident_tpu.models.clap.features import log_mel_features

    fe = ClapFeatureExtractor()
    rng = np.random.default_rng(2)
    x = (0.3 * rng.standard_normal(480_000)).astype(np.float32)
    ref = fe(x, sampling_rate=48_000, truncation="rand_trunc", return_tensors="np")
    ref_mel = ref["input_features"][0, 0]  # [1001, 64]
    ours = np.asarray(log_mel_features(x[None], slaney=True))[0]
    assert ours.shape == ref_mel.shape
    np.testing.assert_allclose(ours, ref_mel, atol=2e-2)
    # relative agreement where energy is non-trivial
    mask = ref_mel > ref_mel.max() - 60
    rel = np.abs(ours[mask] - ref_mel[mask]) / np.maximum(np.abs(ref_mel[mask]), 1.0)
    assert rel.max() < 1e-3


def test_checkpoint_port_roundtrip(tmp_path):
    """Production path: torch.save a state_dict, load_checkpoint converts it,
    embeddings match the in-memory port exactly."""
    import torch

    from audio_ident_tpu.models.clap.port import load_checkpoint

    params, model = init_random_params(SMALL, seed=9)
    ckpt = tmp_path / "clap_audio.pt"
    torch.save(model.state_dict(), ckpt)
    loaded = load_checkpoint(str(ckpt), SMALL)

    rng = np.random.default_rng(5)
    mel = rng.normal(-20.0, 12.0, (2, 250, SMALL.num_mel_bins)).astype(np.float32)
    a = np.asarray(audio_embed(params, SMALL, mel))
    b = np.asarray(audio_embed(loaded, SMALL, mel))
    np.testing.assert_allclose(a, b, atol=1e-6)

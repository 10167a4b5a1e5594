"""CLAP port-validation matrix (r3 verdict item 7).

Real weights are unobtainable in this image, so the swap-in day must be
trivially safe: this matrix pins the port against the torch twin across
every axis that a checkpoint load exercises — seeds (weight statistics),
input window sizes (the time-interpolation path), bf16-vs-f32 (the
production ``fast=True`` tower), and chunk counts (the pow2-padded batch
forward the ingest path uses).  If all cells pass on random weights, a
real checkpoint ports identically; docs/CLAP_RUNBOOK.md is the
end-to-end recipe that starts from this matrix.

Reference behavior being matched: real `laion/larger_clap_music_and_speech`
inference (reference: app/audio/embedding.py:81-96).
"""

import numpy as np
import pytest

from audio_ident_tpu.models.clap.htsat import ClapAudioConfig, audio_embed
from audio_ident_tpu.models.clap.port import init_random_params

SMALL = dict(
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


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize("t_in", [64 * 4, 250, 101])
def test_port_matrix_seeds_and_windows(seed, t_in):
    """f32 parity across >=3 seeds x 3 window sizes (exact-size,
    interpolated-long, interpolated-short)."""
    cfg = ClapAudioConfig(**SMALL)
    params, model = init_random_params(cfg, seed=seed)
    rng = np.random.default_rng(seed * 7 + t_in)
    mel = rng.normal(-20.0, 15.0, (2, t_in, cfg.num_mel_bins)).astype(np.float32)
    ours = np.asarray(audio_embed(params, cfg, mel))
    theirs = _torch_embed(model, mel)
    cos = np.sum(ours * theirs, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_port_matrix_bf16_production_tower(seed):
    """The production fast=True (bf16 MXU) tower stays within the
    documented ~1e-3 cosine shift of the f32 torch twin — the tolerance
    the serving threshold (0.60) is insensitive to."""
    cfg = ClapAudioConfig(**SMALL, fast=True)
    params, model = init_random_params(cfg, seed=seed)
    rng = np.random.default_rng(seed)
    mel = rng.normal(-20.0, 15.0, (2, 250, cfg.num_mel_bins)).astype(np.float32)
    ours = np.asarray(audio_embed(params, cfg, mel))
    theirs = _torch_embed(model, mel)
    cos = np.sum(ours * theirs, axis=-1)
    assert np.all(cos > 1.0 - 5e-3), cos


def test_port_matrix_chunk_count_invariance(monkeypatch):
    """embed_chunks pow2-pads the batch; padding must not change the
    embeddings of the real chunks, for every chunk count the pad
    boundary crosses (1, 2, 3, 5 -> caps 1, 2, 4, 8)."""
    from audio_ident_tpu.search import vibe as vibe_mod

    cfg = ClapAudioConfig(**SMALL)
    params, _ = init_random_params(cfg, seed=31)
    lane = vibe_mod.VibeLane(params, cfg, threshold=0.0)
    rng = np.random.default_rng(31)

    sr = vibe_mod.EMBED_SR
    win_sec = vibe_mod.WINDOW / sr
    for n_wins in (1, 2, 3, 5):
        pcm = (0.1 * rng.standard_normal(int(n_wins * win_sec * sr))).astype(
            np.float32
        )
        n_chunks = len(vibe_mod.chunk_offsets(len(pcm)))
        emb, offs = lane.embed_chunks(pcm)
        assert emb.shape[0] == len(offs) == n_chunks
        # each chunk embedded alone must equal its batched row
        for i in (0, n_chunks - 1):
            start = int(offs[i] * sr)
            single = np.zeros(vibe_mod.WINDOW, np.float32)
            seg = pcm[start : start + vibe_mod.WINDOW]
            single[: len(seg)] = seg
            alone, _ = lane.embed_chunks(single)
            np.testing.assert_allclose(emb[i], alone[0], atol=1e-5)

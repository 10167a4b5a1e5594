"""Vibe lane: chunking, aggregation scoring, vector top-k, end-to-end
retrieval with a small random CLAP (mirrors reference test coverage of
embedding chunk boundaries + aggregation math, SURVEY.md §4 technique 6)."""

import numpy as np
import pytest

from audio_ident_tpu.models.clap.htsat import ClapAudioConfig
from audio_ident_tpu.search.aggregation import aggregate_chunk_hits
from audio_ident_tpu.search.vibe import VibeLane, chunk_offsets, chunk_pcm, query_window
from audio_ident_tpu.vector.search import DeviceVectorIndex, vector_topk
from audio_ident_tpu.vector.store import VectorStore

from tests.conftest import synth_audio

SR = 48_000

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


# -- chunking (reference: embedding.py:101-152 semantics) ----------------------


def test_chunk_offsets_long_track():
    # 25s -> windows at 0,5,10,15,20 (last 5s chunk >= 1s min)
    assert chunk_offsets(25 * SR) == [0, 5 * SR, 10 * SR, 15 * SR, 20 * SR]


def test_chunk_offsets_short_tail_skipped():
    # 20.5s -> the 20s chunk is 0.5s < min 1s -> skipped
    assert chunk_offsets(int(20.5 * SR)) == [0, 5 * SR, 10 * SR, 15 * SR]


def test_chunk_offsets_minimal():
    assert chunk_offsets(SR) == [0]  # exactly 1s
    assert chunk_offsets(SR // 2) == []  # under the minimum


def test_chunk_pcm_zero_pads():
    x = np.ones(12 * SR, np.float32)
    chunks, offsets = chunk_pcm(x)
    assert chunks.shape == (3, 10 * SR)
    assert offsets.tolist() == [0.0, 5.0, 10.0]
    assert chunks[1, : 7 * SR].all() and not chunks[1, 7 * SR :].any()
    assert chunks[2, : 2 * SR].all() and not chunks[2, 2 * SR :].any()


def test_query_window_repeatpad():
    x = np.arange(4 * SR, dtype=np.float32)
    w = query_window(x)
    assert len(w) == 10 * SR
    np.testing.assert_array_equal(w[: 4 * SR], x)
    np.testing.assert_array_equal(w[4 * SR : 8 * SR], x)  # repeated
    np.testing.assert_array_equal(w[8 * SR :], x[: 2 * SR])


# -- aggregation (reference: aggregation.py:63-138 semantics) -------------------


def test_aggregate_top_k_mean_and_bonus():
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    tracks = np.array([1, 1, 1, 1, 2], np.int32)
    offsets = np.array([0.0, 5.0, 10.0, 15.0, 0.0], np.float32)
    out = aggregate_chunk_hits(scores, tracks, offsets)
    assert out[0].track_row == 1
    np.testing.assert_allclose(out[0].base_score, (0.9 + 0.8 + 0.7) / 3, rtol=1e-6)
    np.testing.assert_allclose(out[0].diversity_bonus, min(4 / 5, 1.0) * 0.05)
    assert out[1].track_row == 2
    np.testing.assert_allclose(out[1].base_score, 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[1].diversity_bonus, 0.01)


def test_aggregate_excludes_exact_match():
    scores = np.array([0.95, 0.5], np.float32)
    tracks = np.array([3, 4], np.int32)
    offsets = np.zeros(2, np.float32)
    out = aggregate_chunk_hits(scores, tracks, offsets, exclude_track_row=3)
    assert [r.track_row for r in out] == [4]


def test_aggregate_ignores_padding():
    scores = np.array([0.9, 0.0], np.float32)
    tracks = np.array([1, -1], np.int32)
    offsets = np.zeros(2, np.float32)
    out = aggregate_chunk_hits(scores, tracks, offsets)
    assert len(out) == 1


# -- vector top-k ---------------------------------------------------------------


def test_vector_topk_exact():
    rng = np.random.default_rng(0)
    vs = VectorStore(dim=8)
    e = rng.standard_normal((20, 8)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    vs.add_track(0, e[:10], np.arange(10, dtype=np.float32))
    vs.add_track(1, e[10:], np.arange(10, dtype=np.float32))
    dvi = DeviceVectorIndex.from_host(vs)
    q = e[13]
    s, t, o, c = (np.asarray(a) for a in vector_topk(q, dvi, 5))
    assert t[0] == 1 and abs(s[0] - 1.0) < 1e-5  # self-match first
    brute = e @ q
    np.testing.assert_allclose(np.sort(s)[::-1], np.sort(brute)[-5:][::-1], atol=1e-5)


def test_vector_topk_respects_tombstones():
    rng = np.random.default_rng(1)
    vs = VectorStore(dim=8)
    e = rng.standard_normal((6, 8)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    vs.add_track(0, e[:3], np.zeros(3, np.float32))
    vs.add_track(1, e[3:], np.zeros(3, np.float32))
    track_valid = np.array([True, False])  # track 1 tombstoned
    dvi = DeviceVectorIndex.from_host(vs, track_valid=track_valid)
    s, t, o, c = (np.asarray(a) for a in vector_topk(e[4], dvi, 6))
    assert 1 not in t[t >= 0]


def test_vector_store_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    vs = VectorStore(dim=4)
    vs.add_track(7, rng.standard_normal((3, 4)).astype(np.float32), np.arange(3.0))
    vs.save(tmp_path / "v")
    vs2 = VectorStore.load(tmp_path / "v")
    assert vs2.num_chunks == 3
    np.testing.assert_array_equal(vs2.track, [7, 7, 7])
    assert vs2.delete_track(7) == 3
    assert vs2.num_chunks == 0


# -- end-to-end retrieval with a random CLAP ------------------------------------


@pytest.fixture(scope="module")
def vibe_setup():
    from audio_ident_tpu.models.clap.port import init_random_params

    params, _ = init_random_params(SMALL, seed=7)
    lane = VibeLane(params, SMALL, threshold=0.0)
    vs = VectorStore(dim=SMALL.projection_dim)
    audios = []
    for row in range(3):
        x = synth_audio(np.random.default_rng(900 + row), 16.0, SR)
        audios.append(x)
        emb, offs = lane.embed_chunks(x)
        assert emb.shape[0] == len(offs) == 4  # 16s -> chunks at 0/5/10/15
        vs.add_track(row, emb, offs)
    return lane, vs, audios


def test_vibe_end_to_end_self_retrieval(vibe_setup):
    lane, vs, audios = vibe_setup
    dvi = DeviceVectorIndex.from_host(vs)
    # query = head of track 1: its first chunk embedding matches exactly
    out = lane.search_scores(audios[1][: 10 * SR], dvi)
    assert out and out[0].track_row == 1
    assert out[0].base_score > 0.9


def test_vibe_exclude_exact(vibe_setup):
    lane, vs, audios = vibe_setup
    dvi = DeviceVectorIndex.from_host(vs)
    out = lane.search_scores(audios[1][: 10 * SR], dvi, exclude_track_row=1)
    assert all(r.track_row != 1 for r in out)

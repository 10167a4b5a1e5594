"""Vibe lane: CLAP chunk embedding + on-device cosine top-k + aggregation.

Mirrors the reference vibe lane (reference:
audio-ident-service/app/search/vibe.py:36-239) with the engines swapped:
- chunking 10 s window / 5 s hop / min 1 s / zero-pad last
  (reference: app/audio/embedding.py:101-152) as a static-shape framing op;
- ALL chunks embed in ONE batched MXU forward (the reference embeds
  sequentially per chunk — its ingest bottleneck, SURVEY.md §3.2);
- query embedding is deterministic: first 10 s of the clip, repeat-padded
  when shorter (the HF extractor's "rand_trunc" random crop is replaced by
  a frozen head crop);
- top-50 exact cosine via vector_topk, aggregation + 0.60 threshold.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audio_ident_tpu import spec
from audio_ident_tpu.models.clap.features import CHUNK_SAMPLES, log_mel_features
from audio_ident_tpu.models.clap.htsat import ClapAudioConfig, audio_embed
from audio_ident_tpu.search.aggregation import TrackScore, aggregate_chunk_hits
from audio_ident_tpu.vector.search import DeviceVectorIndex, vector_topk

EMBED_SR = 48_000
WINDOW = int(spec.CHUNK_WINDOW_SEC * EMBED_SR)
HOP = int(spec.CHUNK_HOP_SEC * EMBED_SR)
MIN_CHUNK = int(spec.MIN_CHUNK_SEC * EMBED_SR)


def chunk_offsets(num_samples: int) -> list[int]:
    """Chunk start samples (mirrors reference chunk_audio loop bounds)."""
    starts = []
    start = 0
    while start < num_samples:
        if min(start + WINDOW, num_samples) - start < MIN_CHUNK:
            break
        starts.append(start)
        start += HOP
    return starts


def chunk_pcm(pcm_48k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[S] -> ([N, WINDOW] zero-padded chunks, [N] offsets in seconds)."""
    starts = chunk_offsets(len(pcm_48k))
    if not starts:
        return np.zeros((0, WINDOW), np.float32), np.zeros(0, np.float32)
    out = np.zeros((len(starts), WINDOW), dtype=np.float32)
    for i, s in enumerate(starts):
        seg = pcm_48k[s : s + WINDOW]
        out[i, : len(seg)] = seg
    return out, (np.asarray(starts, np.float32) / EMBED_SR)


def query_window(pcm_48k: np.ndarray) -> np.ndarray:
    """Deterministic 10 s query window: head crop, repeat-pad if shorter."""
    x = pcm_48k[:CHUNK_SAMPLES]
    if len(x) < CHUNK_SAMPLES and len(x) > 0:
        reps = int(np.ceil(CHUNK_SAMPLES / len(x)))
        x = np.tile(x, reps)[:CHUNK_SAMPLES]
    out = np.zeros(CHUNK_SAMPLES, np.float32)
    out[: len(x)] = x
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def _embed_batch(params, config: ClapAudioConfig, chunks: jnp.ndarray) -> jnp.ndarray:
    """[N, WINDOW] 48 kHz pcm -> [N, dim] unit-norm embeddings."""
    mel = log_mel_features(chunks, slaney=True, n_mel=config.num_mel_bins)
    return audio_embed(params, config, mel)


def _pow2_pad(n: int, minimum: int = 1) -> int:
    return max(minimum, 1 << int(np.ceil(np.log2(max(n, 1)))))


@dataclass
class VibeCandidate:
    track_row: int
    similarity: float


class VibeLane:
    """Host driver: embeddings + device vector index + scoring."""

    def __init__(
        self,
        params,
        config: ClapAudioConfig,
        *,
        threshold: float = 0.60,
        search_limit: int = 50,
    ):
        # device-resident params: passing host arrays re-uploads ~80 MB of
        # weights on EVERY call (measured 50x slowdown through the tunnel)
        self.params = jax.device_put(params)
        self.config = config
        self.threshold = threshold
        self.search_limit = search_limit

    # -- embedding -------------------------------------------------------------

    def embed_chunks(self, pcm_48k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All chunks of a track in one batched forward (pow2-padded)."""
        chunks, offsets = chunk_pcm(pcm_48k)
        n = len(chunks)
        if n == 0:
            return np.zeros((0, self.config.projection_dim), np.float32), offsets
        cap = _pow2_pad(n)
        padded = np.zeros((cap, WINDOW), np.float32)
        padded[:n] = chunks
        emb = np.asarray(_embed_batch(self.params, self.config, padded))
        return emb[:n], offsets

    def embed_query(self, pcm_48k: np.ndarray) -> np.ndarray:
        w = query_window(pcm_48k)
        return np.asarray(_embed_batch(self.params, self.config, w[None]))[0]

    # -- search ------------------------------------------------------------------

    def search_scores(
        self,
        pcm_48k: np.ndarray,
        dvi: DeviceVectorIndex,
        *,
        exclude_track_row: int | None = None,
    ) -> list[TrackScore]:
        """Ranked + thresholded track scores against a device vector index
        (f32 exact, or int8-quantized preselect + exact rescore)."""
        q = self.embed_query(pcm_48k)
        from audio_ident_tpu.vector.quant import QuantVectorIndex, quant_topk

        if isinstance(dvi, QuantVectorIndex):
            s, t, o, _ = quant_topk(q, dvi, self.search_limit)
        else:
            s, t, o, _ = vector_topk(jnp.asarray(q), dvi, self.search_limit)
        scores = aggregate_chunk_hits(
            np.asarray(s), np.asarray(t), np.asarray(o),
            exclude_track_row=exclude_track_row,
        )
        return [r for r in scores if r.final_score >= self.threshold]

"""audio-ident-tpu: TPU-native audio identification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``MacPhobos/audio-ident`` service (see /root/repo/SURVEY.md):

- exact lane: Shazam/Olaf-style spectral-peak constellation fingerprinting
  (reference delegates to the external ``olaf_c`` C binary + LMDB;
  here it is a fused on-device pipeline over a device-resident sharded index)
- vibe lane: CLAP-style 512-d audio embeddings searched by batched cosine
  top-k over a device-resident embedding matrix (reference: PyTorch + Qdrant)
- two-phase dedup, metadata catalog, blob store, HTTP API, eval harness.

Layout:
  ops/            DSP + fingerprint device ops (STFT, peaks, hashing, resample)
  cpu_reference/  frozen NumPy golden implementations (parity oracle)
  index/          device-resident fingerprint index (CSR main + sorted delta)
  models/         Flax CLAP (HTSAT) audio tower + deterministic fallback embedder
  vector/         device-resident embedding vector store (cosine top-k)
  parallel/       mesh / sharding / collective layer (pjit + shard_map)
  search/         exact & vibe lanes, aggregation, orchestrator, streaming
  service/        asyncio HTTP control plane (own server; no FastAPI dependency)
  utils/          logging, timing, profiling helpers
"""

__version__ = "0.1.0"

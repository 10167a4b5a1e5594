"""On-device vector search: the Qdrant replacement.

The reference stores 512-d CLAP chunk embeddings in an external Qdrant
server and queries HNSW over HTTP (reference:
audio-ident-service/app/audio/qdrant_setup.py:50-182).  Here the embedding
matrix is device-resident and top-k is an exact batched cosine matmul on
the MXU — *more* accurate than HNSW (exact vs approximate recall,
SURVEY.md §7 hard part 7) and latency-dominated by one [N, 512] x [512]
product instead of a network round trip.  Payload (track row / chunk
offset / chunk index) lives in parallel int/float arrays.
"""

from audio_ident_tpu.vector.store import VectorStore
from audio_ident_tpu.vector.search import DeviceVectorIndex, vector_topk

__all__ = ["VectorStore", "DeviceVectorIndex", "vector_topk"]

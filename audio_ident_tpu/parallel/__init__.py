"""Multi-chip sharding: mesh-partitioned index + collective match.

The reference has no distributed layer (SURVEY.md §2 rows 34-35) — its
scale-out story is a single process in front of external engines.  Here the
fingerprint index is hash-range sharded over a ``jax.sharding.Mesh`` and
queries fan out via ``shard_map`` with XLA collectives (``all_gather``) as
the entire communication backend; no NCCL/MPI analog exists or is needed.
"""

from audio_ident_tpu.parallel.multihost import init_distributed
from audio_ident_tpu.parallel.sharded_index import (
    ShardedDeviceIndex,
    make_index_mesh,
    sharded_match,
    sharded_match_batch,
)
from audio_ident_tpu.parallel.sharded_vectors import (
    ShardedVectorIndex,
    sharded_vector_topk,
)

__all__ = [
    "ShardedDeviceIndex",
    "ShardedVectorIndex",
    "init_distributed",
    "make_index_mesh",
    "sharded_match",
    "sharded_match_batch",
    "sharded_vector_topk",
]

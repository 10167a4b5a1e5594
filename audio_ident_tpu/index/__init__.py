"""Device-resident fingerprint index (the LMDB replacement).

Two-level LSM design: an immutable main CSR (bucket offsets over the 24-bit
hash space + postings) plus a small sorted delta absorbing new ingests —
the functional-JAX answer to the reference's mutable LMDB B-tree
(reference: app/audio/fingerprint.py:5-8 single-writer constraint).
"""

from audio_ident_tpu.index.store import FingerprintIndex
from audio_ident_tpu.index.match import DeviceIndex, match_device

__all__ = ["FingerprintIndex", "DeviceIndex", "match_device"]

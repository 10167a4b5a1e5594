"""Search lanes: exact (fingerprint) and vibe (embedding) + orchestration.

Mirrors the reference's search layer (reference:
audio-ident-service/app/search/) with the heavy lifting moved onto the
device: fingerprinting, hash-bucket matching and embedding top-k are XLA
programs; consensus / aggregation / orchestration stay on the host control
plane.
"""

from audio_ident_tpu.search.exact import ExactCandidate, ExactLane

__all__ = ["ExactCandidate", "ExactLane"]

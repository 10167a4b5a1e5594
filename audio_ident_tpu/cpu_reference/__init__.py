"""Frozen NumPy golden implementations (the parity oracle).

The CPU reference path *defines* the fingerprint and match semantics; the
JAX/TPU pipeline in ``audio_ident_tpu.ops`` must agree with it (SURVEY.md §7
hard part 1: the reference repo never vendored Olaf's C source, so parity is
defined against this module).  The service exposes this path as a fallback
backend so fingerprints from CPU and TPU interoperate bit-for-bit.
"""

from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np, Peaks
from audio_ident_tpu.cpu_reference.match import match_votes_np

__all__ = ["fingerprint_np", "match_votes_np", "Peaks"]

"""JAX/XLA device ops: the TPU compute path of the framework.

Mirrors the frozen semantics of ``audio_ident_tpu.cpu_reference`` — see
``audio_ident_tpu/spec.py`` for the shared constants and decision rules.
"""

from audio_ident_tpu.ops.fingerprint import (
    fingerprint_jax,
    fingerprint_batch,
    log_magnitude_jax,
    quantized_salience_jax,
)
from audio_ident_tpu.ops.resample import resample_48k_to_16k

__all__ = [
    "fingerprint_jax",
    "fingerprint_batch",
    "log_magnitude_jax",
    "quantized_salience_jax",
    "resample_48k_to_16k",
]

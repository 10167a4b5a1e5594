"""Host-side utilities: native library bindings, profiling hooks."""

from audio_ident_tpu.utils.native import native_lib

__all__ = ["native_lib"]

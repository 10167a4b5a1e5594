"""HTTP service layer: API contract, ingestion, catalog, engines.

The service keeps the reference's frozen API contract
(reference: docs/api-contract.md v1.2.0) while swapping every external
engine (olaf_c/LMDB, fpcalc, Torch CLAP, Qdrant) for in-process TPU device
programs over host-owned state.
"""

from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.settings import Settings, load_settings

__all__ = ["create_app", "Settings", "load_settings"]

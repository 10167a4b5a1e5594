"""Service settings from environment / .env (pydantic model, stdlib loader).

Mirrors reference: audio-ident-service/app/settings.py:4-58 (pydantic-
settings isn't in this environment, so a small .env loader feeds a plain
pydantic model).  Adds the TPU-specific knobs the reference never needed:
mesh shape and index capacity.
"""

from __future__ import annotations

import os
from pathlib import Path

from pydantic import BaseModel


def _load_env_file(path: str | Path) -> dict[str, str]:
    out: dict[str, str] = {}
    p = Path(path)
    if not p.is_file():
        return out
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        k, _, v = line.partition("=")
        out[k.strip()] = v.strip().strip('"').strip("'")
    return out


class Settings(BaseModel):
    # server
    service_name: str = "audio-ident-tpu"
    service_version: str = "0.1.0"
    host: str = "127.0.0.1"
    port: int = 17010
    cors_origins: list[str] = ["http://localhost:17000"]

    # storage
    data_root: str = "./data"
    # XLA compile cache is machine-global (programs are data-independent;
    # a per-deployment cache forces minutes of recompiles on first boot)
    compile_cache: str = "~/.cache/audio-ident-tpu/xla"
    # catalog db file lives under data_root unless overridden
    catalog_path: str | None = None
    index_path: str | None = None  # fingerprint index snapshot dir
    vector_path: str | None = None  # embedding store snapshot dir

    # auth (fail-closed like the reference: app/auth/admin.py:17-29);
    # JWT fields feed the unwired token helpers (stub parity with the
    # reference's app/auth/jwt.py scaffolding)
    admin_api_key: str | None = None
    jwt_secret: str | None = None
    jwt_algorithm: str = "HS256"
    jwt_expire_seconds: int = 3600

    # vibe lane / CLAP (reference: app/settings.py:43-48)
    clap_checkpoint: str | None = None  # torch .bin/.pt checkpoint path
    clap_random_init: bool = False  # test/bench only: random weights
    embedding_model: str = "clap-htsat-large"
    embedding_dim: int = 512
    vibe_match_threshold: float = 0.60
    vector_search_limit: int = 50
    # int8 = scalar-quantized device codes (1/4 HBM) + exact f32 rescore,
    # mirroring the reference's Qdrant int8 quantization config
    # (reference: app/audio/qdrant_setup.py:50-77); none = f32 matrix
    vector_quant: str = "none"  # none | int8
    exact_timeout_sec: float = 3.0
    vibe_timeout_sec: float = 4.0

    # ingest bounds (reference: app/ingest/pipeline.py:41-42)
    min_duration_sec: float = 3.0
    max_duration_sec: float = 1800.0
    max_search_upload_bytes: int = 10 * 1024 * 1024
    max_ingest_upload_bytes: int = 50 * 1024 * 1024

    # TPU
    max_tracks: int = 1 << 20
    mesh_shards: int = 0  # 0 = single device
    micro_batch: bool = True  # co-batch concurrent exact searches

    # durability / maintenance
    wal_fsync: str = "always"  # always | interval | off (see index/wal.py)
    compact_delta_postings: int = 2_000_000  # LSM merge trigger; 0 disables

    # streaming identification sessions (BASELINE config #3)
    max_streams: int = 8
    stream_idle_timeout_sec: float = 120.0

    @property
    def storage_root(self) -> Path:
        return Path(self.data_root)

    @property
    def catalog_file(self) -> Path:
        return Path(self.catalog_path or (self.storage_root / "catalog.sqlite3"))

    @property
    def index_dir(self) -> Path:
        return Path(self.index_path or (self.storage_root / "fp_index"))

    @property
    def vector_dir(self) -> Path:
        return Path(self.vector_path or (self.storage_root / "vec_index"))


def load_settings(env_file: str | Path = ".env") -> Settings:
    """Environment variables override .env values; both override defaults."""
    raw = _load_env_file(env_file)
    raw.update(os.environ)
    fields = {}
    for name, field in Settings.model_fields.items():
        key = name.upper()
        if key not in raw:
            continue
        val: object = raw[key]
        if name == "cors_origins":
            val = [o.strip() for o in str(val).split(",") if o.strip()]
        fields[name] = val
    return Settings(**fields)

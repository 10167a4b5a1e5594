"""Run the service: ``python -m audio_ident_tpu.service``."""

from __future__ import annotations

import asyncio
import logging

from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.http import serve
from audio_ident_tpu.service.settings import load_settings


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # honor JAX_PLATFORMS even though the platform plugin force-overrides it
    # (same re-pin as tests/conftest.py)
    import os

    if "JAX_PLATFORMS" in os.environ:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    settings = load_settings()
    app = create_app(settings)
    try:
        asyncio.run(serve(app, settings.host, settings.port))
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()

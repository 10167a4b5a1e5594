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
    settings = load_settings()
    app = create_app(settings)
    try:
        asyncio.run(serve(app, settings.host, settings.port))
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()

"""OpenAPI spec: served at /openapi.json, all $refs resolve, contract
routes present (the UI's type generation consumes this spec)."""

import json

import pytest
import httpx

from audio_ident_tpu.service.openapi import build_spec

pytestmark = pytest.mark.anyio

EXPECTED_PATHS = {
    "/health",
    "/api/v1/version",
    "/api/v1/search",
    "/api/v1/ingest",
    "/api/v1/tracks",
    "/api/v1/tracks/{id}",
    "/api/v1/tracks/{id}/audio",
}


def _collect_refs(node, acc):
    if isinstance(node, dict):
        for k, v in node.items():
            if k == "$ref":
                acc.add(v)
            else:
                _collect_refs(v, acc)
    elif isinstance(node, list):
        for v in node:
            _collect_refs(v, acc)


def test_spec_builds_and_refs_resolve():
    spec = build_spec("audio-ident-tpu", "0.1.0")
    assert spec["openapi"].startswith("3.1")
    assert EXPECTED_PATHS <= set(spec["paths"])
    refs = set()
    _collect_refs(spec["paths"], refs)
    _collect_refs(spec["components"]["schemas"], refs)
    names = set(spec["components"]["schemas"])
    for ref in refs:
        assert ref.startswith("#/components/schemas/"), ref
        assert ref.rsplit("/", 1)[1] in names, f"dangling ref {ref}"
    # error shape matches the contract
    err = spec["components"]["schemas"]["ErrorResponse"]
    assert "error" in err["properties"]
    json.dumps(spec)  # must be serializable


async def test_openapi_endpoint(tmp_path):
    from audio_ident_tpu.service.app import create_app
    from audio_ident_tpu.service.catalog import Catalog
    from audio_ident_tpu.service.settings import Settings
    from audio_ident_tpu.service.state import EngineState

    app = create_app(
        Settings(data_root=str(tmp_path / "d")),
        catalog=Catalog(":memory:"),
        engine=EngineState(max_tracks=64),
    )
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    ) as c:
        r = await c.get("/openapi.json")
        assert r.status_code == 200
        body = r.json()
        assert body["info"]["x-contract-version"] == "1.2.0"
        assert "/api/v1/search" in body["paths"]

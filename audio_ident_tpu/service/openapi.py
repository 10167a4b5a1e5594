"""OpenAPI 3.1 spec for the service, generated from the pydantic schemas.

The reference auto-generates this via FastAPI (`/openapi.json`,
reference: docs/api-contract.md type-generation section) and the UI runs
``openapi-typescript`` against it.  Here the spec is assembled from the
same pydantic models that validate responses, so the contract stays
single-sourced.
"""

from __future__ import annotations

from typing import Any

from pydantic import TypeAdapter

from audio_ident_tpu.service import schemas as S

API_VERSION = "1.2.0"  # contract version (reference: docs/api-contract.md:3)

_RESPONSE_MODELS = [
    S.HealthResponse,
    S.VersionResponse,
    S.SearchResponse,
    S.IngestResponse,
    S.IngestReport,
    S.TrackDetail,
    S.ErrorResponse,
    S.PaginatedResponse[S.TrackInfo],
    S.StreamCreateResponse,
    S.StreamPushResponse,
]


def _ref(model) -> dict:
    name = getattr(model, "__name__", None) or str(model)
    return {"$ref": f"#/components/schemas/{name}"}


def _json_response(model, description: str = "") -> dict:
    return {
        "description": description or "response",
        "content": {"application/json": {"schema": _ref(model)}},
    }


_ERR = _json_response(S.ErrorResponse, "error")


def build_spec(service_name: str, service_version: str) -> dict[str, Any]:
    defs: dict[str, Any] = {}
    for model in _RESPONSE_MODELS:
        schema = TypeAdapter(model).json_schema(
            ref_template="#/components/schemas/{model}", mode="serialization"
        )
        defs.update(schema.pop("$defs", {}))
        name = getattr(model, "__name__", None) or str(model)
        defs[schema.get("title", name)] = schema

    multipart_search = {
        "multipart/form-data": {
            "schema": {
                "type": "object",
                "required": ["audio"],
                "properties": {
                    "audio": {"type": "string", "format": "binary"},
                    "mode": {"enum": ["exact", "vibe", "both"], "default": "both"},
                    "max_results": {
                        "type": "integer", "minimum": 1, "maximum": 50, "default": 10,
                    },
                },
            }
        }
    }
    multipart_ingest = {
        "multipart/form-data": {
            "schema": {
                "type": "object",
                "properties": {
                    "audio": {"type": "string", "format": "binary"},
                    "directory": {"type": "string"},
                },
                "description": "exactly one of audio or directory",
            }
        }
    }

    paths = {
        "/health": {
            "get": {
                "operationId": "health",
                "responses": {"200": _json_response(S.HealthResponse)},
            }
        },
        "/api/v1/version": {
            "get": {
                "operationId": "getVersion",
                "responses": {"200": _json_response(S.VersionResponse)},
            }
        },
        "/api/v1/search": {
            "post": {
                "operationId": "searchAudio",
                "requestBody": {"required": True, "content": multipart_search},
                "responses": {
                    "200": _json_response(S.SearchResponse),
                    "400": _ERR, "503": _ERR, "504": _ERR,
                },
            }
        },
        "/api/v1/ingest": {
            "post": {
                "operationId": "ingestAudio",
                "security": [{"AdminKey": []}],
                "requestBody": {"required": True, "content": multipart_ingest},
                "responses": {
                    "201": _json_response(S.IngestResponse, "single file ingested"),
                    "200": _json_response(S.IngestReport, "batch report / duplicate"),
                    "400": _ERR, "403": _ERR, "429": _ERR, "503": _ERR,
                },
            }
        },
        "/api/v1/tracks": {
            "get": {
                "operationId": "listTracks",
                "parameters": [
                    {"name": "page", "in": "query",
                     "schema": {"type": "integer", "default": 1}},
                    {"name": "pageSize", "in": "query",
                     "schema": {"type": "integer", "default": 50, "maximum": 100}},
                    {"name": "search", "in": "query", "schema": {"type": "string"}},
                ],
                "responses": {
                    "200": _json_response(S.PaginatedResponse[S.TrackInfo]),
                    "400": _ERR,
                },
            }
        },
        "/api/v1/tracks/{id}": {
            "get": {
                "operationId": "getTrack",
                "parameters": [
                    {"name": "id", "in": "path", "required": True,
                     "schema": {"type": "string", "format": "uuid"}},
                ],
                "responses": {
                    "200": _json_response(S.TrackDetail),
                    "400": _ERR, "404": _ERR,
                },
            },
            "delete": {
                "operationId": "deleteTrack",
                "security": [{"AdminKey": []}],
                "parameters": [
                    {"name": "id", "in": "path", "required": True,
                     "schema": {"type": "string", "format": "uuid"}},
                ],
                "responses": {
                    "204": {"description": "track removed (blob retained)"},
                    "400": _ERR, "403": _ERR, "404": _ERR,
                },
            },
        },
        "/api/v1/stream": {
            "post": {
                "operationId": "createStream",
                "description": "Open a streaming-identification session "
                "(sliding 5 s windows, carried votes; no reference "
                "counterpart).",
                "responses": {
                    "201": _json_response(S.StreamCreateResponse),
                    "429": _ERR,
                },
            }
        },
        "/api/v1/stream/{id}/audio": {
            "post": {
                "operationId": "pushStreamAudio",
                "parameters": [
                    {"name": "id", "in": "path", "required": True,
                     "schema": {"type": "string", "format": "uuid"}},
                ],
                "requestBody": {
                    "required": True,
                    "content": {"application/octet-stream": {"schema": {
                        "type": "string", "format": "binary",
                        "description": "raw mono 16 kHz PCM: s16le by "
                        "default, f32le when content-type mentions f32/float",
                    }}},
                },
                "responses": {
                    "200": _json_response(S.StreamPushResponse),
                    "400": _ERR, "404": _ERR,
                },
            }
        },
        "/api/v1/stream/{id}": {
            "delete": {
                "operationId": "closeStream",
                "parameters": [
                    {"name": "id", "in": "path", "required": True,
                     "schema": {"type": "string", "format": "uuid"}},
                ],
                "responses": {"204": {"description": "stream closed"}, "404": _ERR},
            }
        },
        "/api/v1/tracks/{id}/audio": {
            "get": {
                "operationId": "getTrackAudio",
                "parameters": [
                    {"name": "id", "in": "path", "required": True,
                     "schema": {"type": "string", "format": "uuid"}},
                    {"name": "Range", "in": "header", "schema": {"type": "string"}},
                ],
                "responses": {
                    "200": {"description": "full audio file",
                            "content": {"audio/*": {"schema": {
                                "type": "string", "format": "binary"}}}},
                    "206": {"description": "partial content (Range)"},
                    "400": _ERR, "404": _ERR,
                },
            }
        },
    }

    return {
        "openapi": "3.1.0",
        "info": {
            "title": service_name,
            "version": service_version,
            "x-contract-version": API_VERSION,
        },
        "paths": paths,
        "components": {
            "schemas": defs,
            "securitySchemes": {
                "AdminKey": {
                    "type": "apiKey", "in": "header", "name": "X-Admin-Key",
                }
            },
        },
    }

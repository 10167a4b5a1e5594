"""Admin-key auth: fail-closed, timing-safe.

Mirrors reference: audio-ident-service/app/auth/admin.py:17-52 — if no
admin key is configured the admin endpoints REFUSE (fail-closed), and key
comparison is constant-time.  The reference's JWT/argon2/OAuth2 files are
unwired scaffolding (docs/api-contract.md authentication section); the
equivalent stub here is ``create_access_token``/``verify_access_token``
(HS256 via stdlib hmac), also not wired to any route.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time

from audio_ident_tpu.service.http import HttpError, Request

ADMIN_KEY_HEADER = "x-admin-key"


def require_admin_key(request: Request, configured_key: str | None) -> None:
    """Raise 403 unless the request carries the configured admin key."""
    if not configured_key:
        raise HttpError(
            403, "ADMIN_DISABLED",
            "Admin endpoints are disabled: no admin API key is configured",
        )
    provided = request.headers.get(ADMIN_KEY_HEADER, "")
    if not hmac.compare_digest(provided.encode(), configured_key.encode()):
        raise HttpError(403, "FORBIDDEN", "Invalid admin API key")


# -- JWT scaffolding (stub parity with reference app/auth/jwt.py) ---------------


def _b64(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def create_access_token(subject: str, secret: str, expires_sec: int = 3600) -> str:
    header = _b64(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    payload = _b64(
        json.dumps({"sub": subject, "exp": int(time.time()) + expires_sec}).encode()
    )
    signing = f"{header}.{payload}".encode()
    sig = _b64(hmac.new(secret.encode(), signing, hashlib.sha256).digest())
    return f"{header}.{payload}.{sig}"


def verify_access_token(token: str, secret: str) -> dict | None:
    try:
        header, payload, sig = token.split(".")
    except ValueError:
        return None
    signing = f"{header}.{payload}".encode()
    expect = _b64(hmac.new(secret.encode(), signing, hashlib.sha256).digest())
    if not hmac.compare_digest(sig, expect):
        return None
    claims = json.loads(_unb64(payload))
    if claims.get("exp", 0) < time.time():
        return None
    return claims

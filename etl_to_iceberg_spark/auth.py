"""OAuth2 (Keycloak-style) token acquisition for remote job submission.

Re-expresses the reference's Keycloak utilities
(``/root/reference/airflow-plugins/utils/keycloak_auth.py:12-128``:
password-grant fetch and refresh-token exchange against
``{url}/realms/{realm}/protocol/openid-connect/token``, optional
client_secret, 30 s timeout, failures surfaced as typed exceptions) as a
dependency-free client the :mod:`etl_to_iceberg_spark.submit` control
plane can pair with (the reference exports the token to the launched job
as the ``KEYCLOAK_TOKEN`` env var and a Bearer header,
``spark/keycloak_spark_operator.py:179-283``).

Beyond parity, :class:`TokenManager` adds the lifecycle the reference
re-pays per task: it caches the token, re-uses it until ``expires_in``
minus a skew, renews via the refresh grant, and falls back to a full
re-authentication when the refresh itself is rejected (expired/revoked
refresh tokens answer 400) — the behavior a long-running scheduler
actually needs. Everything is stdlib (urllib), so the module imports and
tests offline; only calling it requires a reachable identity provider.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field


class AuthError(RuntimeError):
    """Token endpoint failure: HTTP error, bad payload, or unreachable."""

    def __init__(self, message: str, status: int | None = None, body: str = ""):
        super().__init__(message)
        self.status = status
        self.body = body


def token_url(keycloak_url: str, realm: str) -> str:
    """The realm's OpenID Connect token endpoint (ref layout,
    keycloak_auth.py:34)."""
    return (
        f"{keycloak_url.rstrip('/')}/realms/{realm}"
        "/protocol/openid-connect/token"
    )


def _post_form(url: str, data: dict[str, str], timeout: float) -> dict:
    body = urllib.parse.urlencode(data).encode("ascii")
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:
        detail = e.read().decode("utf-8", "replace")
        raise AuthError(
            f"token endpoint returned {e.code}: {detail[:200]}",
            status=e.code,
            body=detail,
        ) from e
    except urllib.error.URLError as e:
        raise AuthError(f"token endpoint unreachable: {e.reason}") from e
    try:
        parsed = json.loads(payload)
    except ValueError as e:
        raise AuthError(
            f"token endpoint returned non-JSON: {payload[:200]}", body=payload
        ) from e
    if "access_token" not in parsed:
        raise AuthError(
            "token response lacks access_token", body=payload[:200]
        )
    return parsed


def fetch_token(
    keycloak_url: str,
    realm: str,
    client_id: str,
    *,
    client_secret: str | None = None,
    username: str | None = None,
    password: str | None = None,
    timeout: float = 30.0,
) -> dict:
    """Acquire a token response (ref: get_keycloak_token,
    keycloak_auth.py:12-72).

    With ``username``/``password`` this is the password grant the
    reference uses; without them it degrades to client_credentials
    (secret-only service accounts — the other standard Keycloak shape).
    Returns the full token response dict (``access_token``,
    ``refresh_token``, ``expires_in``, ...), not just the access token:
    the refresh lifecycle needs the rest.
    """
    data = {"client_id": client_id}
    if username is not None:
        data.update(
            grant_type="password", username=username, password=password or ""
        )
    else:
        data["grant_type"] = "client_credentials"
    if client_secret:
        data["client_secret"] = client_secret
    return _post_form(token_url(keycloak_url, realm), data, timeout)


def refresh_token(
    keycloak_url: str,
    realm: str,
    client_id: str,
    refresh_tok: str,
    *,
    client_secret: str | None = None,
    timeout: float = 30.0,
) -> dict:
    """Exchange a refresh token for a new token response (ref:
    refresh_keycloak_token, keycloak_auth.py:75-128)."""
    data = {
        "client_id": client_id,
        "grant_type": "refresh_token",
        "refresh_token": refresh_tok,
    }
    if client_secret:
        data["client_secret"] = client_secret
    return _post_form(token_url(keycloak_url, realm), data, timeout)


def bearer_header(access_token: str) -> dict[str, str]:
    """Authorization header for REST submission endpoints (ref:
    keycloak_spark_operator.py:283)."""
    return {"Authorization": f"Bearer {access_token}"}


def token_env(access_token: str) -> dict[str, str]:
    """Env block the launched job reads (ref exports KEYCLOAK_TOKEN to
    the spark-submit subprocess, keycloak_spark_operator.py:278)."""
    return {"KEYCLOAK_TOKEN": access_token}


@dataclass
class TokenManager:
    """Cached, self-renewing access token for a long-running control
    plane.

    ``token()`` serves the cached access token until ``expires_in`` minus
    ``skew_sec``, then renews: first via the refresh grant (cheap, no
    credential replay), and only if THAT is rejected outright (Keycloak
    answers 400 invalid_grant for expired/revoked refresh tokens, 401
    for bad client auth) falls back to a full re-authentication;
    transient failures (unreachable, 5xx) re-raise rather than replay
    the credential. The reference has no cache at all —
    every task pays a password grant (keycloak_spark_operator.py:243) —
    so this is strictly additive on the same endpoint contract.
    """

    keycloak_url: str
    realm: str
    client_id: str
    client_secret: str | None = None
    username: str | None = None
    password: str | None = None
    skew_sec: float = 30.0
    timeout: float = 30.0
    _response: dict | None = field(default=None, repr=False)
    _expires_at: float = field(default=0.0, repr=False)

    def token(self, now: float | None = None) -> str:
        now = time.monotonic() if now is None else now
        if self._response is None or now >= self._expires_at:
            self._renew(now)
        return self._response["access_token"]

    def invalidate(self) -> None:
        """Drop the cache (e.g. after a 401 from the submission API)."""
        self._response = None
        self._expires_at = 0.0

    def _renew(self, now: float) -> None:
        resp = None
        if self._response is not None and self._response.get("refresh_token"):
            try:
                resp = refresh_token(
                    self.keycloak_url,
                    self.realm,
                    self.client_id,
                    self._response["refresh_token"],
                    client_secret=self.client_secret,
                    timeout=self.timeout,
                )
            except AuthError as e:
                # Only a REJECTED grant (Keycloak answers 400
                # invalid_grant for expired/revoked refresh tokens, 401
                # for bad client auth) justifies replaying the user
                # credential. Unreachable/garbled (status None) and
                # server-side 5xx are transient: the refresh token is
                # still valid, so re-raise and let the caller retry
                # instead of burning a password grant per blip.
                if e.status not in (400, 401):
                    raise
                resp = None  # rejected refresh: fall through to full auth
        if resp is None:
            resp = fetch_token(
                self.keycloak_url,
                self.realm,
                self.client_id,
                client_secret=self.client_secret,
                username=self.username,
                password=self.password,
                timeout=self.timeout,
            )
        self._response = resp
        lifetime = float(resp.get("expires_in", 60.0))
        self._expires_at = now + max(0.0, lifetime - self.skew_sec)

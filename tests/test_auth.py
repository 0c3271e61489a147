"""OAuth2 token client tests against a real in-process HTTP server.

The handler implements the Keycloak token endpoint's observable
contract (form-encoded POST at /realms/{realm}/protocol/openid-connect/
token; grant_type password / client_credentials / refresh_token; 400
invalid_grant for a bad refresh token) so the client is exercised over
actual sockets, offline and deterministically.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from etl_to_iceberg_spark.auth import (
    AuthError,
    TokenManager,
    bearer_header,
    fetch_token,
    refresh_token,
    token_env,
    token_url,
)


class _Keycloak(BaseHTTPRequestHandler):
    requests: list[dict] = []  # class-level capture, reset per fixture
    valid_refresh = {"rt-1"}
    refresh_5xx = False
    counter = 0

    def do_POST(self):  # noqa: N802 (http.server API)
        length = int(self.headers["Content-Length"])
        form = dict(
            urllib.parse.parse_qsl(self.rfile.read(length).decode("ascii"))
        )
        type(self).requests.append(
            {"path": self.path, "form": form,
             "ctype": self.headers["Content-Type"]}
        )
        if self.path != "/realms/etl/protocol/openid-connect/token":
            return self._reply(404, {"error": "unknown endpoint"})
        grant = form.get("grant_type")
        if grant == "refresh_token":
            if type(self).refresh_5xx:
                return self._reply(503, {"error": "temporarily_unavailable"})
            if form.get("refresh_token") not in type(self).valid_refresh:
                return self._reply(400, {"error": "invalid_grant"})
        elif grant == "password":
            if form.get("password") != "s3cret":
                return self._reply(401, {"error": "invalid_user"})
        elif grant != "client_credentials":
            return self._reply(400, {"error": "unsupported_grant_type"})
        type(self).counter += 1
        n = type(self).counter
        return self._reply(
            200,
            {
                "access_token": f"at-{n}",
                "refresh_token": f"rt-{n}",
                "expires_in": 300,
                "token_type": "Bearer",
            },
        )

    def _reply(self, status: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def idp():
    _Keycloak.requests = []
    _Keycloak.valid_refresh = {"rt-1"}
    _Keycloak.refresh_5xx = False
    _Keycloak.counter = 0
    srv = HTTPServer(("127.0.0.1", 0), _Keycloak)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()
        t.join()


def test_token_url_matches_reference_layout():
    assert (
        token_url("https://kc.example:8443/", "etl")
        == "https://kc.example:8443/realms/etl/protocol/openid-connect/token"
    )


def test_password_grant_posts_reference_form(idp):
    resp = fetch_token(
        idp, "etl", "spark-client",
        client_secret="cs", username="svc", password="s3cret",
    )
    assert resp["access_token"] == "at-1"
    (req,) = _Keycloak.requests
    assert req["ctype"] == "application/x-www-form-urlencoded"
    assert req["form"] == {
        "client_id": "spark-client", "grant_type": "password",
        "username": "svc", "password": "s3cret", "client_secret": "cs",
    }


def test_client_credentials_when_no_username(idp):
    fetch_token(idp, "etl", "spark-client", client_secret="cs")
    assert _Keycloak.requests[0]["form"]["grant_type"] == "client_credentials"
    assert "username" not in _Keycloak.requests[0]["form"]


def test_refresh_grant_and_error_surface(idp):
    ok = refresh_token(idp, "etl", "spark-client", "rt-1")
    assert ok["access_token"] == "at-1"
    with pytest.raises(AuthError) as ei:
        refresh_token(idp, "etl", "spark-client", "rt-BOGUS")
    assert ei.value.status == 400 and "invalid_grant" in ei.value.body


def test_http_error_raises_typed_auth_error(idp):
    with pytest.raises(AuthError) as ei:
        fetch_token(idp, "etl", "c", username="svc", password="WRONG")
    assert ei.value.status == 401


def test_unreachable_endpoint_raises(idp):
    with pytest.raises(AuthError) as ei:
        fetch_token(
            "http://127.0.0.1:1", "etl", "c",
            username="svc", password="s3cret", timeout=0.5,
        )
    assert ei.value.status is None


def test_manager_caches_until_skewed_expiry_then_refreshes(idp):
    tm = TokenManager(
        idp, "etl", "spark-client", username="svc", password="s3cret",
        skew_sec=30.0,
    )
    assert tm.token(now=0.0) == "at-1"  # password grant
    assert tm.token(now=100.0) == "at-1"  # cached: 100 < 300 - 30
    assert len(_Keycloak.requests) == 1
    _Keycloak.valid_refresh.add("rt-1")
    assert tm.token(now=270.0) == "at-2"  # expired: refresh grant
    assert _Keycloak.requests[-1]["form"]["grant_type"] == "refresh_token"
    assert _Keycloak.requests[-1]["form"]["refresh_token"] == "rt-1"


def test_manager_falls_back_to_full_auth_on_rejected_refresh(idp):
    tm = TokenManager(
        idp, "etl", "spark-client", username="svc", password="s3cret",
    )
    assert tm.token(now=0.0) == "at-1"
    _Keycloak.valid_refresh = set()  # revoke everything
    assert tm.token(now=1000.0) == "at-2"  # refresh 400 -> password grant
    grants = [r["form"]["grant_type"] for r in _Keycloak.requests]
    assert grants == ["password", "refresh_token", "password"]


def test_manager_reraises_transient_refresh_failure_without_replay(idp):
    # A 5xx from the refresh grant is transient: the refresh token is
    # still valid, so the manager must NOT replay the password credential
    # (ADVICE r8) — it re-raises and the caller retries.
    tm = TokenManager(
        idp, "etl", "spark-client", username="svc", password="s3cret",
    )
    assert tm.token(now=0.0) == "at-1"
    _Keycloak.refresh_5xx = True
    with pytest.raises(AuthError) as ei:
        tm.token(now=1000.0)
    assert ei.value.status == 503
    grants = [r["form"]["grant_type"] for r in _Keycloak.requests]
    assert grants == ["password", "refresh_token"]  # no password replay
    # once the outage clears, the SAME refresh token succeeds
    _Keycloak.refresh_5xx = False
    _Keycloak.valid_refresh.add("rt-1")
    assert tm.token(now=1000.0) == "at-2"
    assert _Keycloak.requests[-1]["form"]["grant_type"] == "refresh_token"


def test_manager_invalidate_forces_fresh_token(idp):
    tm = TokenManager(
        idp, "etl", "spark-client", username="svc", password="s3cret",
    )
    assert tm.token(now=0.0) == "at-1"
    tm.invalidate()
    assert tm.token(now=0.0) == "at-2"


def test_submit_integration_headers_and_env():
    assert bearer_header("abc") == {"Authorization": "Bearer abc"}
    assert token_env("abc") == {"KEYCLOAK_TOKEN": "abc"}

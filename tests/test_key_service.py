"""HttpKeyService behavior matrix (HttpKeyServiceTest parity: 200 cached,
400 permanent, 5xx retried x5 with doubling backoff)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from uc_historic_data_importer_spark.sources.key_service import (
    DataKeyDecryptionException,
    DataKeyServiceUnavailableException,
    HttpKeyService,
)


@pytest.fixture()
def server():
    state = {"calls": [], "responses": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            state["calls"].append((self.path, body.decode()))
            status, payload = (
                state["responses"].pop(0) if state["responses"] else (200, {"plaintextDataKey": "PLAIN"})
            )
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd, state
    httpd.shutdown()


def _svc(httpd):
    sleeps = []
    svc = HttpKeyService(
        f"http://127.0.0.1:{httpd.server_port}", sleep=sleeps.append
    )
    return svc, sleeps


def test_success_and_memoization(server):
    httpd, state = server
    svc, _ = _svc(httpd)
    assert svc.decrypt_key("kek/one two", "ENC") == "PLAIN"
    assert svc.decrypt_key("kek/one two", "ENC") == "PLAIN"
    assert len(state["calls"]) == 1  # cached
    path, body = state["calls"][0]
    assert path == "/datakey/actions/decrypt?keyId=kek%2Fone%20two"
    assert body == "ENC"


def test_400_is_permanent_no_retry(server):
    httpd, state = server
    state["responses"] = [(400, {})]
    svc, sleeps = _svc(httpd)
    with pytest.raises(DataKeyDecryptionException):
        svc.decrypt_key("kek", "BAD")
    assert len(state["calls"]) == 1
    assert sleeps == []


def test_5xx_retried_with_doubling_backoff_then_success(server):
    httpd, state = server
    state["responses"] = [(503, {}), (503, {}), (200, {"plaintextDataKey": "P2"})]
    svc, sleeps = _svc(httpd)
    assert svc.decrypt_key("kek", "ENC2") == "P2"
    assert len(state["calls"]) == 3
    assert sleeps == [1.0, 2.0]


def test_gives_up_after_max_attempts(server):
    httpd, state = server
    state["responses"] = [(503, {})] * 5
    svc, sleeps = _svc(httpd)
    with pytest.raises(DataKeyServiceUnavailableException):
        svc.decrypt_key("kek", "ENC3")
    assert len(state["calls"]) == 5
    assert sleeps == [1.0, 2.0, 4.0, 8.0]

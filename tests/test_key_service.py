"""HttpKeyService behavior matrix (HttpKeyServiceTest parity: 200 cached,
400 permanent, 5xx retried x5 with doubling backoff) + the mutual-TLS
transport (SecureHttpClientProvider.kt:48,60 parity: client identity
keystore presented, server chain verified against the trust store)."""

import json
import ssl
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from uc_historic_data_importer_spark.sources.key_service import (
    DataKeyDecryptionException,
    DataKeyServiceUnavailableException,
    HttpKeyService,
    mtls_context,
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


# --------------------------------------------------------------------------
# Mutual TLS (SecureHttpClientProvider.kt:48,60): an in-process HTTPS
# server that REQUIRES a client certificate, with every cert generated
# ephemerally at test time (no key material checked in). Skipped only if
# the `cryptography` wheel is absent — and scoped to the mTLS fixtures,
# NOT module level: a module-level importorskip would silently skip the
# plain-HTTP retry/backoff matrix above whenever the optional wheel is
# missing (a coverage regression on tests that need no crypto at all).
# --------------------------------------------------------------------------


def _make_cert(subject_name, issuer_cert=None, issuer_key=None, is_ca=False):
    """Self-signed (CA) or CA-signed leaf cert with a 127.0.0.1 SAN."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, subject_name)])
    issuer = issuer_cert.subject if issuer_cert is not None else name
    sign_key = issuer_key if issuer_key is not None else key
    now = datetime.datetime.now(datetime.timezone.utc)
    builder = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(issuer)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(hours=1))
        .add_extension(
            x509.BasicConstraints(ca=is_ca, path_length=None), critical=True
        )
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
    )
    cert = builder.sign(sign_key, hashes.SHA256())
    return cert, key


def _pem(path, obj, private=False):
    from cryptography.hazmat.primitives import serialization

    if private:
        data = obj.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
    else:
        data = obj.public_bytes(serialization.Encoding.PEM)
    path.write_bytes(data)
    return str(path)


@pytest.fixture(scope="module")
def tls_material(tmp_path_factory):
    """One ephemeral CA signing a server cert and a client cert, plus a
    SECOND independent CA (for the untrusted-peer negative cases)."""
    pytest.importorskip("cryptography")
    d = tmp_path_factory.mktemp("tls")
    ca_cert, ca_key = _make_cert("test-ca", is_ca=True)
    srv_cert, srv_key = _make_cert("dks-server", ca_cert, ca_key)
    cli_cert, cli_key = _make_cert("importer-client", ca_cert, ca_key)
    rogue_ca_cert, rogue_ca_key = _make_cert("rogue-ca", is_ca=True)
    rogue_cert, rogue_key = _make_cert("rogue-client", rogue_ca_cert, rogue_ca_key)
    return {
        "ca": _pem(d / "ca.pem", ca_cert),
        "server_cert": _pem(d / "server.pem", srv_cert),
        "server_key": _pem(d / "server.key", srv_key, private=True),
        "client_cert": _pem(d / "client.pem", cli_cert),
        "client_key": _pem(d / "client.key", cli_key, private=True),
        "rogue_ca": _pem(d / "rogue_ca.pem", rogue_ca_cert),
        "rogue_cert": _pem(d / "rogue.pem", rogue_cert),
        "rogue_key": _pem(d / "rogue.key", rogue_key, private=True),
    }


@pytest.fixture()
def tls_server(tls_material):
    """HTTPS key service that REQUIRES a CA-signed client certificate —
    the server side of the reference's mTLS posture."""
    state = {"calls": [], "responses": [], "peers": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            state["calls"].append((self.path, body.decode()))
            state["peers"].append(self.connection.getpeercert())
            status, payload = (
                state["responses"].pop(0)
                if state["responses"]
                else (200, {"plaintextDataKey": "TLS-PLAIN"})
            )
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

        def handle_one_request(self):
            # a client that fails the TLS handshake surfaces here as an
            # SSLError on the first read — swallow it so the server
            # thread survives the negative-path tests
            try:
                super().handle_one_request()
            except ssl.SSLError:
                self.close_connection = True

    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(
        tls_material["server_cert"], tls_material["server_key"]
    )
    srv_ctx.load_verify_locations(tls_material["ca"])
    srv_ctx.verify_mode = ssl.CERT_REQUIRED  # mutual TLS

    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    httpd.socket = srv_ctx.wrap_socket(httpd.socket, server_side=True)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd, state
    httpd.shutdown()


def _tls_svc(httpd, tls_material, **ctx_kwargs):
    sleeps = []
    ctx = mtls_context(
        ctx_kwargs.get("client_cert", tls_material["client_cert"]),
        ctx_kwargs.get("client_key", tls_material["client_key"]),
        ctx_kwargs.get("ca", tls_material["ca"]),
    )
    svc = HttpKeyService(
        f"https://127.0.0.1:{httpd.server_port}",
        sleep=sleeps.append,
        ssl_context=ctx,
    )
    return svc, sleeps


def test_mtls_handshake_success_and_client_identity_seen(tls_server, tls_material):
    httpd, state = tls_server
    svc, _ = _tls_svc(httpd, tls_material)
    assert svc.decrypt_key("kek/tls one", "ENC-TLS") == "TLS-PLAIN"
    assert state["calls"] == [
        ("/datakey/actions/decrypt?keyId=kek%2Ftls%20one", "ENC-TLS")
    ]
    # the server really validated a client certificate (mutual TLS, not
    # just server TLS): the peer cert is present and is our client CN
    peer = state["peers"][0]
    assert peer, "server saw no client certificate"
    subject = {k: v for rdn in peer["subject"] for (k, v) in rdn}
    assert subject["commonName"] == "importer-client"


def test_mtls_retry_matrix_unchanged_over_tls(tls_server, tls_material):
    httpd, state = tls_server
    state["responses"] = [(503, {}), (503, {}), (200, {"plaintextDataKey": "P-TLS"})]
    svc, sleeps = _tls_svc(httpd, tls_material)
    assert svc.decrypt_key("kek", "ENC-R") == "P-TLS"
    assert len(state["calls"]) == 3
    assert sleeps == [1.0, 2.0]


def test_mtls_400_still_permanent_over_tls(tls_server, tls_material):
    httpd, state = tls_server
    state["responses"] = [(400, {})]
    svc, sleeps = _tls_svc(httpd, tls_material)
    with pytest.raises(DataKeyDecryptionException):
        svc.decrypt_key("kek", "BAD-TLS")
    assert len(state["calls"]) == 1
    assert sleeps == []


def test_mtls_rejects_client_signed_by_untrusted_ca(tls_server, tls_material):
    """A client presenting an identity from a CA outside the server's
    trust store fails the handshake — treated as a retryable transport
    error (the service may be mid-rollover), exhausting all attempts."""
    httpd, state = tls_server
    svc, sleeps = _tls_svc(
        httpd,
        tls_material,
        client_cert=tls_material["rogue_cert"],
        client_key=tls_material["rogue_key"],
    )
    with pytest.raises(DataKeyServiceUnavailableException):
        svc.decrypt_key("kek", "ENC-X")
    assert state["calls"] == []  # nothing reached the application layer
    assert len(sleeps) == 4  # all 5 attempts consumed


def test_mtls_client_rejects_server_not_in_trust_store(tls_server, tls_material):
    """Trust-store enforcement in the other direction: the client
    refuses a server whose chain does not end in its CA file."""
    httpd, state = tls_server
    svc, _ = _tls_svc(httpd, tls_material, ca=tls_material["rogue_ca"])
    with pytest.raises(DataKeyServiceUnavailableException):
        svc.decrypt_key("kek", "ENC-Y")
    assert state["calls"] == []

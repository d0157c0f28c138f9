"""HTTP data-key service client — the production implementation of the
KeyService protocol (sources/metadata.py).

Reference behavior (app/services/impl/HttpKeyService.kt:35-81,127-137):
- POST the encrypted key to
  ``$service/datakey/actions/decrypt?keyId=<url-encoded key id>``
- 200 -> response JSON's ``plaintextDataKey``
- 400 -> DataKeyDecryptionException, NOT retried (the key is bad; a
  retry cannot fix it)
- anything else (or transport error) -> retried up to 5 attempts with
  1 s initial backoff doubling each time
- results memoized per (encryptedKey, keyId) — callers additionally
  deduplicate via resolve_data_keys, so at most one POST per distinct
  key per run.

stdlib urllib + ssl only: the engine adds no HTTP dependencies.

Mutual TLS: the reference loads identity/trust keystores and speaks
mTLS to DKS (SecureHttpClientProvider.kt:48,60 — `loadKeyMaterial` is
the client identity keystore, `loadTrustMaterial` the CA trust store).
The Python twins are ``SSLContext.load_cert_chain`` (identity) and
``load_verify_locations`` (trust), assembled by :func:`mtls_context`
and passed to ``urlopen(..., context=...)``. Transport security is
orthogonal to the retry/backoff/caching/400-is-permanent semantics
above — an ``HttpKeyService`` with a context behaves identically
minus the handshake (pinned by the in-process-TLS-server pytest).
"""

from __future__ import annotations

import json
import ssl
import time
import urllib.error
import urllib.parse
import urllib.request


def mtls_context(
    client_cert_file: str,
    client_key_file: str,
    ca_file: str,
    key_password: str | None = None,
) -> ssl.SSLContext:
    """Build the DKS mutual-TLS client context.

    Mirrors SecureHttpClientProvider.kt:48,60: the (cert, key) pair is
    the identity keystore (presented to the server when it requests a
    client certificate), ``ca_file`` is the trust store that the DKS
    server certificate must chain to. Hostname checking and
    CERT_REQUIRED stay at their secure defaults
    (``create_default_context`` is the hardened constructor)."""
    ctx = ssl.create_default_context(ssl.Purpose.SERVER_AUTH, cafile=ca_file)
    ctx.load_cert_chain(
        certfile=client_cert_file,
        keyfile=client_key_file,
        password=key_password,
    )
    return ctx


class DataKeyServiceUnavailableException(Exception):
    """Retryable failure talking to the key service."""


class DataKeyDecryptionException(Exception):
    """HTTP 400: the service cannot decrypt this key — permanent."""


class HttpKeyService:
    MAX_ATTEMPTS = 5
    INITIAL_BACKOFF_S = 1.0
    BACKOFF_MULTIPLIER = 2.0

    def __init__(
        self,
        service_url: str,
        timeout_s: float = 30.0,
        sleep=time.sleep,
        ssl_context: ssl.SSLContext | None = None,
    ):
        self._url = service_url.rstrip("/")
        self._timeout = timeout_s
        self._sleep = sleep  # injectable for tests
        self._ssl_context = ssl_context  # mTLS: see mtls_context()
        self._cache: dict[tuple[str, str], str] = {}

    def decrypt_key(self, key_encryption_key_id: str, encrypted_key: str) -> str:
        cache_key = (encrypted_key, key_encryption_key_id)
        if cache_key in self._cache:
            return self._cache[cache_key]
        last_error: Exception | None = None
        for attempt in range(self.MAX_ATTEMPTS):
            if attempt:
                self._sleep(
                    self.INITIAL_BACKOFF_S * self.BACKOFF_MULTIPLIER ** (attempt - 1)
                )
            try:
                plaintext = self._post(key_encryption_key_id, encrypted_key)
                self._cache[cache_key] = plaintext
                return plaintext
            except DataKeyDecryptionException:
                raise
            except Exception as e:  # transport / 5xx -> retry
                last_error = e
        raise DataKeyServiceUnavailableException(
            f"Giving up after {self.MAX_ATTEMPTS} attempts: {last_error}"
        )

    def _post(self, key_id: str, encrypted_key: str) -> str:
        url = (
            f"{self._url}/datakey/actions/decrypt?keyId="
            + urllib.parse.quote(key_id, safe="")
        )
        req = urllib.request.Request(
            url, data=encrypted_key.encode("utf-8"), method="POST"
        )
        try:
            with urllib.request.urlopen(
                req, timeout=self._timeout, context=self._ssl_context
            ) as resp:
                body = json.loads(resp.read().decode("utf-8"))
                return body["plaintextDataKey"]
        except urllib.error.HTTPError as e:
            if e.code == 400:
                raise DataKeyDecryptionException(
                    f"Key service returned 400 for keyId={key_id!r}"
                ) from e
            raise DataKeyServiceUnavailableException(
                f"Key service returned {e.code}"
            ) from e

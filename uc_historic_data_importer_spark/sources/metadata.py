"""S6-S7: encryption-metadata parsing and data-key resolution.

S6 (EncryptionMetadataProcessor.kt:20-47): parse the sidecar JSON, assert
the three required fields are non-blank.

S7 (HttpKeyService.kt:35-81 + DataKeyProcessor.kt:16-28): decrypt the
per-file data key via the DKS HTTP service, memoized per
(keyId, encryptedKey). In Spark this is driver-side work: the distinct
key pairs per run are few (one per input file at most), so we resolve
them once on the driver and broadcast the plaintext map — the broadcast
twin of the reference's in-process cache (SURVEY.md §2.6 "broadcast join").

The KeyService is pluggable: tests use DummyKeyService (the sidecar's
plaintextDatakey field, present in the reference's own test fixtures —
sample_data.py:53-57); a real deployment implements decrypt() against a
key service endpoint. A 400 response is a hard error; other failures are
retryable (HttpKeyService.kt:58-76).
"""

from __future__ import annotations

import json
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("keyEncryptionKeyId", T.StringType()),
        T.StructField("encryptedEncryptionKey", T.StringType()),
        T.StructField("initialisationVector", T.StringType()),
        T.StructField("plaintextDatakey", T.StringType()),
    ]
)

REQUIRED_FIELDS = (
    "keyEncryptionKeyId",
    "encryptedEncryptionKey",
    "initialisationVector",
)


class MetadataValidationError(Exception):
    """EncryptionMetadataProcessor.kt:28-41: blank required field."""


class KeyService(Protocol):
    def decrypt_key(self, key_encryption_key_id: str, encrypted_key: str) -> str:
        """Return the base64 plaintext data key."""


class DummyKeyService:
    """Test-environment key service: the sidecar carries the plaintext key
    (as in the reference's own integration fixtures). decrypt_key is an
    identity lookup into the metadata provided at construction."""

    def __init__(self, plaintext_by_encrypted: dict[str, str]):
        self._map = plaintext_by_encrypted

    def decrypt_key(self, key_encryption_key_id: str, encrypted_key: str) -> str:
        return self._map[encrypted_key]


def parse_metadata(pairs: DataFrame) -> DataFrame:
    """S6: read each sidecar file (driver-side — sidecars are tiny and one
    per input file) and attach parsed fields to the pair rows."""
    rows = pairs.collect()
    enriched = []
    for r in rows:
        with open(r["meta_path"], "r", encoding="utf-8") as fh:
            meta = json.load(fh)
        for f in REQUIRED_FIELDS:
            if not str(meta.get(f) or "").strip():
                raise MetadataValidationError(
                    f"Failed to parse encryption metadata: blank '{f}' in {r['meta_path']}"
                )
        enriched.append(
            tuple(r)
            + (
                meta["keyEncryptionKeyId"],
                meta["encryptedEncryptionKey"],
                meta["initialisationVector"],
                meta.get("plaintextDatakey"),
            )
        )
    # explicit schema: optional fields (plaintextDatakey) may be None for
    # every row, which defeats type inference
    schema = T.StructType(
        list(pairs.schema.fields)
        + [
            T.StructField("key_encryption_key_id", T.StringType()),
            T.StructField("encrypted_encryption_key", T.StringType()),
            T.StructField("initialisation_vector", T.StringType()),
            T.StructField("plaintext_datakey", T.StringType()),
        ]
    )
    return pairs.sparkSession.createDataFrame(enriched, schema)


def resolve_data_keys(pairs_with_meta: DataFrame, key_service: KeyService) -> dict[tuple[str, str], str]:
    """S7: resolve each distinct (keyId, encryptedKey) once on the driver.

    Returns the plaintext-key map to broadcast into the decrypt stage —
    identical dedup semantics to the reference's memoized cache
    (HttpKeyService.kt:39-41,127)."""
    distinct = (
        pairs_with_meta.select("key_encryption_key_id", "encrypted_encryption_key")
        .distinct()
        .collect()
    )
    return {
        (r["key_encryption_key_id"], r["encrypted_encryption_key"]): key_service.decrypt_key(
            r["key_encryption_key_id"], r["encrypted_encryption_key"]
        )
        for r in distinct
    }

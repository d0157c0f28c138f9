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


_META_COLS = (
    ("keyEncryptionKeyId", "key_encryption_key_id"),
    ("encryptedEncryptionKey", "encrypted_encryption_key"),
    ("initialisationVector", "initialisation_vector"),
    ("plaintextDatakey", "plaintext_datakey"),
)


def parse_metadata(pairs: DataFrame) -> DataFrame:
    """S6: parse every sidecar JSON in a DISTRIBUTED stage and attach the
    fields to the pair rows.

    The sidecar bodies are read with a whole-file text scan + from_json
    (executor-side, one task per file split) instead of a sequential
    driver loop: at 100 TB / 2.2 GB-max files that loop is ~50k+ serial
    file opens — minutes of driver time the reference itself spends on
    pool threads (EncryptionMetadataProcessor.kt:20-47), so Spark must
    not be MORE serial than Spring Batch. Only the path list (already
    driver-resident from the listing) and the bounded validation sample
    stay on the driver.

    Validation (blank/missing required field, malformed JSON -> null
    struct) raises MetadataValidationError with up to 5 offending
    sidecar paths — same bounded-error-collect contract as the pairing
    stage (listing.py)."""
    spark = pairs.sparkSession
    meta_paths = [
        r["meta_path"] for r in pairs.select("meta_path").distinct().collect()
    ]
    if not meta_paths:
        out = pairs
        for _, alias in _META_COLS:
            out = out.withColumn(alias, F.lit(None).cast("string"))
        return out
    # input_file_name() is a URI: percent-escapes need decoding, but a
    # LITERAL '+' in a filename is legal URI-path syntax and must NOT
    # become a space (url_decode applies form-encoding rules) — protect
    # it as %2B first so both '+' and pre-escaped %2B round-trip. If
    # decoding fails (malformed escape), fall back to the RAW stripped
    # path — not the protected one, whose '+' -> '%2B' rewrite would
    # never match the listing
    stripped = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    local_path = F.coalesce(
        F.try_url_decode(F.regexp_replace(stripped, r"\+", "%2B")),
        stripped,
    )
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(meta_paths)
        .select(
            local_path.alias("meta_path"),
            F.from_json(F.col("value"), METADATA_SCHEMA).alias("_m"),
        )
        .select(
            "meta_path",
            *[F.col(f"_m.{src}").alias(alias) for src, alias in _META_COLS],
        )
    )
    # validation is ONE job over the sidecar frame alone — the blank
    # probe collects (path, blank fields) for every sidecar (bounded:
    # one tiny row per file, the same order as the already-collected
    # path list), and "sidecar produced no row" (empty file) falls out
    # driver-side by set difference. The pairs join is never recomputed
    # just to probe for errors.
    blank = F.array_compact(
        F.array(
            *[
                F.when(
                    F.trim(F.coalesce(F.col(alias), F.lit(""))) == "",
                    F.lit(src),
                )
                for src, alias in _META_COLS
                if src in REQUIRED_FIELDS
            ]
        )
    )
    # the probe is ONE aggregate row on the happy path (r10 verdict
    # hardening #1): counting violations + distinct parsed paths never
    # materializes a row per sidecar on the driver; the bounded
    # limit(5) example collects run only on the error paths
    flagged = raw.select("meta_path", blank.alias("_blank"))
    stats = flagged.agg(
        F.sum((F.size("_blank") > 0).cast("long")).alias("n_bad"),
        F.count_distinct("meta_path").alias("n_paths"),
    ).first()
    if stats["n_bad"]:
        bad = (
            flagged.filter(F.size("_blank") > 0)
            .orderBy("meta_path")
            .limit(5)
            .collect()
        )
        detail = "; ".join(
            f"blank {list(r['_blank'])} in {r['meta_path']}" for r in bad
        )
        raise MetadataValidationError(
            f"Failed to parse encryption metadata: {detail}"
        )
    if stats["n_paths"] != len(set(meta_paths)):
        # error path only: name up to 5 sidecars that produced no
        # parseable row (empty files); the full-path set is the same
        # order of driver memory as the meta_paths argument itself
        present = {
            r["meta_path"]
            for r in raw.select("meta_path").distinct().collect()
        }
        missing = sorted(set(meta_paths) - present)[:5]
        raise MetadataValidationError(
            "Failed to parse encryption metadata: no parseable sidecar "
            "content in " + "; ".join(missing)
        )
    return pairs.join(raw, "meta_path", "left").select(
        *pairs.columns, *[alias for _, alias in _META_COLS]
    )


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

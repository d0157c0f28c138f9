"""S1-S4: object listing, file-pair grouping, size filters.

Reference: S3Reader.kt:30-37,62-125 (paginated listing, suffix fan-out,
zero-byte pair skip) and KeyPairGenerator.kt:10-51 (regex pairing +
validation). Here listing yields a DataFrame of object descriptors; the
pairing/validation is Catalyst (regexp_extract + pivot-style self-join +
left_anti missing-metadata check). Works against any Hadoop-visible FS
(file://, s3a://, ...) — at scale the listing itself is driver-side
metadata work exactly as in the reference.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# S3Reader.kt:30-37 defaults
FILENAME_FORMAT = r"[\w-]+\.[\w-]+\.[0-9]+\.json"
DATA_SUFFIX = r"\.gz\.enc$"
METADATA_SUFFIX = r"\.encryption\.json$"
# ANCHORED whole-filename contracts: a name must be EXACTLY
# <stem>.json.gz.enc / <stem>.json.encryption.json to classify. A
# suffix-only check would admit e.g. db.c.0001.json.old.gz.enc (the
# embedded stem matches unanchored, the suffix matches) and then
# FILENAME_GROUPS extraction yields ''/NULL metadata that crashes the
# decrypt stage — the reference instead drops unmatched names with a
# warning (KeyPairGenerator.kt:29-37), which is what `neither` does.
DATA_FULL_RE = rf"^{FILENAME_FORMAT}\.gz\.enc$"
META_FULL_RE = rf"^{FILENAME_FORMAT}\.encryption\.json$"
# HBaseWriter.kt:86-88: db/collection/filenumber capture
FILENAME_GROUPS = r"([\w-]+)\.([\w-]+)\.([0-9]+)\.json\.gz\.enc$"

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)


class MissingMetadataError(Exception):
    """KeyPairGenerator.kt:40-46: a data file without its encryption
    metadata sidecar is a hard error."""


@dataclass
class ListPage:
    """One page of an object listing: (key, size) descriptors plus the
    continuation token for the next page (None on the last page)."""

    objects: list[tuple[str, int]]
    next_token: str | None = None


class ObjectLister(Protocol):
    """Pluggable listing backend (S1).

    Mirrors the S3 ListObjectsV2 shape (S3Reader.kt:79-97: request,
    follow nextContinuationToken while truncated) without binding to a
    client library: local filesystem, boto3, or a Hadoop FS wrapper all
    fit behind this one method."""

    def list_page(
        self, prefix: str, continuation_token: str | None
    ) -> ListPage: ...


class ListingError(Exception):
    """Page fetch failed after all retries (S3Exception analogue)."""


@dataclass
class LocalFsLister:
    """Local directory walk exposed through the paginated interface.

    ``page_size`` exists so pagination handling is exercised even in
    local tests (one giant page would never follow a token)."""

    root: str
    page_size: int = 1000

    def __post_init__(self):
        if self.page_size < 1:
            # pre-guard (r13 review): page_size = 0 returned an EMPTY
            # page whose continuation token never advanced, so
            # list_objects looped forever on the driver (probed) — a
            # hang, not an error
            raise ValueError(f"page_size must be >= 1 (got {self.page_size})")

    def list_page(self, prefix: str, continuation_token: str | None) -> ListPage:
        base = os.path.join(self.root, prefix) if prefix else self.root
        keys = []
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                # absolute paths: the metadata stage compares these
                # listing paths against input_file_name()'s absolute
                # URIs, and the decrypt stage open()s them from
                # executor processes whose cwd is not the driver's — a
                # relative root would make every sidecar look missing
                p = os.path.abspath(os.path.join(dirpath, f))
                keys.append((p, os.path.getsize(p)))
        keys.sort()
        start = int(continuation_token) if continuation_token else 0
        page = keys[start : start + self.page_size]
        nxt = start + self.page_size
        return ListPage(page, str(nxt) if nxt < len(keys) else None)


@dataclass
class Boto3Lister:
    """S3 backend via boto3 ListObjectsV2 (S3Reader.kt:79-97 parity).

    Import-gated: constructing it without boto3 installed raises with a
    clear message; nothing else in the module needs the dependency.

    Emitted paths are SCHEME-QUALIFIED (``uri_prefix`` + key, default
    ``s3a://<bucket>/``): downstream consumers resolve listing paths
    directly — the sidecar text scan through Spark (which reads s3a
    natively) and the decrypt stage through its pluggable ``opener``
    seam (crypto_source.read_encrypted_jsonl) — so bare keys would
    resolve against the local filesystem and fail."""

    bucket: str
    client: object | None = None
    uri_prefix: str | None = None

    def __post_init__(self):
        if self.client is None:
            try:
                import boto3  # type: ignore[import-not-found]
            except ImportError as ex:  # pragma: no cover - env-dependent
                raise ImportError(
                    "Boto3Lister requires boto3; install it or inject a client"
                ) from ex
            self.client = boto3.client("s3")
        if self.uri_prefix is None:
            self.uri_prefix = f"s3a://{self.bucket}/"

    def list_page(self, prefix: str, continuation_token: str | None) -> ListPage:
        kwargs = {"Bucket": self.bucket, "Prefix": prefix}
        if continuation_token:
            kwargs["ContinuationToken"] = continuation_token
        resp = self.client.list_objects_v2(**kwargs)  # type: ignore[attr-defined]
        objects = [
            (self.uri_prefix + o["Key"], int(o["Size"]))
            for o in resp.get("Contents", [])
        ]
        token = (
            resp.get("NextContinuationToken")
            if resp.get("IsTruncated")
            else None
        )
        return ListPage(objects, token)


# S3Helper.kt:45-49 retry policy
LIST_MAX_ATTEMPTS = 5
LIST_INITIAL_BACKOFF_S = 1.0
LIST_BACKOFF_MULTIPLIER = 2.0


def list_objects(
    spark: SparkSession,
    lister: ObjectLister,
    prefixes: list[str] | None = None,
    max_attempts: int = LIST_MAX_ATTEMPTS,
    sleep=time.sleep,
) -> DataFrame:
    """S1: enumerate all objects via a pluggable paginated lister.

    Follows continuation tokens until exhausted per prefix
    (S3Reader.kt:90-97) and retries each page fetch with exponential
    backoff (S3Helper.kt:33-49: 5 attempts, 1 s initial, x2). Listing is
    driver-side metadata work exactly as in the reference; the result is
    a small descriptor DataFrame that everything downstream consumes."""
    if max_attempts < 1:
        # pre-guard (r13 review): 0 still performed one attempt and then
        # reported "failed after 0 attempts" — a lie in the error path
        raise ValueError(f"max_attempts must be >= 1 (got {max_attempts})")
    rows: list[tuple[str, int]] = []
    for prefix in prefixes if prefixes else [""]:
        token: str | None = None
        while True:
            attempt, delay = 0, LIST_INITIAL_BACKOFF_S
            while True:
                try:
                    page = lister.list_page(prefix, token)
                    break
                except Exception as ex:
                    attempt += 1
                    if attempt >= max_attempts:
                        raise ListingError(
                            f"listing prefix {prefix!r} failed after "
                            f"{max_attempts} attempts: {ex}"
                        ) from ex
                    sleep(delay)
                    delay *= LIST_BACKOFF_MULTIPLIER
            rows.extend(page.objects)
            token = page.next_token
            if token is None:
                break
    return spark.createDataFrame(rows or [], LISTING_SCHEMA)


def list_local_objects(spark: SparkSession, root: str, prefixes: list[str] | None = None) -> DataFrame:
    """S1: list objects under a directory tree (LocalFsLister behind the
    same paginated interface as the S3 backend)."""
    return list_objects(spark, LocalFsLister(root), prefixes)


def pair_files(listing: DataFrame, strict: bool = True) -> DataFrame:
    """S2: group keys into (data, metadata) pairs.

    - a file classifies ONLY on an anchored whole-filename match
      (DATA_FULL_RE / META_FULL_RE): names with extra components (e.g.
      `db.c.0001.json.old.gz.enc`) are `neither` and dropped, exactly
      as the reference drops unmatched names with a warning
      (KeyPairGenerator.kt:29-37) — a suffix-only check would pass them
      through with NULL file_number and crash the decrypt stage;
    - the pair key is the DIRECTORY-QUALIFIED path stem (full path with
      the kind suffix stripped), not the bare filename: identically
      named files under different prefixes must pair with their OWN
      sidecar, not cross-join with every same-named one — the reference
      pairs on the full S3 key, which is unique;
    - stem (the `<db>.<collection>.<NNNN>.json` core,
      KeyPairGenerator.kt:23) is kept as a display column;
    - metadata-without-data is dropped (:47-50);
    - data-without-metadata raises (:40-46) when strict.

    Returns (pair_stem, stem, data_path, data_size, meta_path,
    meta_size, db, collection, file_number)."""
    base = listing.withColumn("filename", F.element_at(F.split(F.col("path"), "/"), -1))
    stem = F.regexp_extract(F.col("filename"), f"({FILENAME_FORMAT})", 1)
    kind = (
        F.when(F.col("filename").rlike(DATA_FULL_RE), F.lit("data"))
        .when(F.col("filename").rlike(META_FULL_RE), F.lit("metadata"))
        .otherwise(F.lit("neither"))
    )
    # dir-qualified pair key: strip the kind suffix from the FULL path
    pair_stem = (
        F.when(
            F.col("kind") == "data",
            F.regexp_replace(F.col("path"), DATA_SUFFIX, ""),
        )
        .when(
            F.col("kind") == "metadata",
            F.regexp_replace(F.col("path"), METADATA_SUFFIX, ""),
        )
        .otherwise(F.lit(""))
    )
    tagged = (
        base.withColumn("kind", kind)
        .withColumn("stem", stem)
        .withColumn("pair_stem", pair_stem)
        .filter(F.col("kind") != "neither")
    )
    data = tagged.filter(F.col("kind") == "data").select(
        "pair_stem",
        "stem",
        F.col("path").alias("data_path"),
        F.col("size").alias("data_size"),
    )
    meta = tagged.filter(F.col("kind") == "metadata").select(
        "pair_stem",
        F.col("path").alias("meta_path"),
        F.col("size").alias("meta_size"),
    )
    if strict:
        missing = data.join(meta, "pair_stem", "left_anti")
        bad = [
            r["pair_stem"]
            for r in missing.select("pair_stem").limit(5).collect()
        ]
        if bad:
            raise MissingMetadataError(f"data objects without metadata: {bad}")
    paired = data.join(meta, "pair_stem", "inner")
    return paired.select(
        "*",
        F.regexp_extract(F.col("data_path"), FILENAME_GROUPS, 1).alias("db"),
        F.regexp_extract(F.col("data_path"), FILENAME_GROUPS, 2).alias("collection"),
        F.regexp_extract(F.col("data_path"), FILENAME_GROUPS, 3)
        .cast("int")
        .alias("file_number"),
    )


def drop_zero_byte_pairs(pairs: DataFrame) -> DataFrame:
    """S3 (S3Reader.kt:111-121): both objects zero bytes -> drop pair."""
    return pairs.filter(~((F.col("data_size") == 0) & (F.col("meta_size") == 0)))


def filter_oversized(pairs: DataFrame, max_size: int = 2_200_000_000) -> DataFrame:
    """S4 (ObjectSizeFilter.kt:12-21): optional, config-driven."""
    return pairs.filter(F.col("data_size") <= F.lit(max_size))

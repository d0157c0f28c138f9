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
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# S3Reader.kt:30-37 defaults
FILENAME_FORMAT = r"[\w-]+\.[\w-]+\.[0-9]+\.json"
DATA_SUFFIX = r"\.gz\.enc$"
METADATA_SUFFIX = r"\.encryption\.json$"
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


def list_local_objects(spark: SparkSession, root: str, prefixes: list[str] | None = None) -> DataFrame:
    """S1: list objects under a directory tree (local test analogue of the
    paginated S3 listing; pagination/retry is the FS client's job —
    S3Helper.kt:17-28 maps to Hadoop S3A retry settings at scale)."""
    rows = []
    roots = [os.path.join(root, p) for p in prefixes] if prefixes else [root]
    for r in roots:
        for dirpath, _dirs, files in os.walk(r):
            for f in files:
                p = os.path.join(dirpath, f)
                rows.append((p, os.path.getsize(p)))
    return spark.createDataFrame(rows or [], LISTING_SCHEMA)


def pair_files(listing: DataFrame, strict: bool = True) -> DataFrame:
    """S2: group keys by filename stem into (data, metadata) pairs.

    - stem = the `<db>.<collection>.<NNNN>.json` core (KeyPairGenerator.kt:23)
    - unmatched filenames and metadata-without-data are dropped with a
      warning in the reference (:29-37,47-50) — dropped here;
    - data-without-metadata raises (:40-46) when strict.

    Returns (stem, data_path, data_size, meta_path, meta_size, db,
    collection, file_number)."""
    base = listing.withColumn("filename", F.element_at(F.split(F.col("path"), "/"), -1))
    stem = F.regexp_extract(F.col("filename"), f"({FILENAME_FORMAT})", 1)
    kind = (
        F.when(F.col("filename").rlike(DATA_SUFFIX), F.lit("data"))
        .when(F.col("filename").rlike(METADATA_SUFFIX), F.lit("metadata"))
        .otherwise(F.lit("neither"))
    )
    tagged = base.withColumn("stem", stem).withColumn("kind", kind).filter(
        (F.col("stem") != "") & (F.col("kind") != "neither")
    )
    data = tagged.filter(F.col("kind") == "data").select(
        "stem",
        F.col("path").alias("data_path"),
        F.col("size").alias("data_size"),
    )
    meta = tagged.filter(F.col("kind") == "metadata").select(
        "stem",
        F.col("path").alias("meta_path"),
        F.col("size").alias("meta_size"),
    )
    if strict:
        missing = data.join(meta, "stem", "left_anti")
        bad = [r["stem"] for r in missing.select("stem").limit(5).collect()]
        if bad:
            raise MissingMetadataError(f"data objects without metadata: {bad}")
    paired = data.join(meta, "stem", "inner")
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

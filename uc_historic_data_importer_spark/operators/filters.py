"""F1-F5: record filtering (SURVEY.md §2.2) — pure Catalyst predicates and
one anti-join.

The reference applies these per record / per batch with RPCs
(FilterServiceImpl.kt:15-37, HbaseClient.kt:43-52); here they are
declarative predicates Catalyst can push down, and the exists-check is a
`left_anti` join — the scalable form of the batched existsAll GETs (never
per-row RPC; at 100 TB AQE picks broadcast vs shuffle side automatically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uc_historic_data_importer_spark.functions.dates import (
    EPOCH_MILLIS,
    parse_hdi_timestamp_millis,
)

FILTER_NOT = "DoNotFilter"
FILTER_EXISTS = "FilterExists"
FILTER_TOO_EARLY = "FilterTooEarly"
FILTER_TOO_LATE = "FilterTooLate"


def parse_filter_bound(value: str | None) -> int | None:
    """Parse a skip.earlier.than / skip.later.than config value.

    The reference accepts the Z-suffixed format and a no-zone format
    interpreted in the JVM default zone (FilterServiceImpl.kt:44-70,82-83);
    we pin UTC. Blank -> None (unbounded)."""
    if not value or not value.strip():
        return None
    v = value.strip()
    if not v.endswith("Z"):
        v = v + "Z"
    return parse_hdi_timestamp_millis(v)


def filter_status_col(
    version: Column,
    earlier_than_millis: int | None,
    later_than_millis: int | None,
) -> Column:
    """FilterServiceImpl.filterStatus (:24-37): strict bounds; the 1980
    epoch sentinel is exempt from the too-early filter (no-timestamp
    records may in fact be recent)."""
    lo = earlier_than_millis if earlier_than_millis is not None else None
    hi = later_than_millis if later_than_millis is not None else None
    status = F.lit(FILTER_NOT)
    if hi is not None:
        status = F.when(version > F.lit(hi), F.lit(FILTER_TOO_LATE)).otherwise(status)
    if lo is not None:
        status = F.when(
            (version < F.lit(lo)) & (version != F.lit(EPOCH_MILLIS)),
            F.lit(FILTER_TOO_EARLY),
        ).otherwise(status)
    return status


def with_filter_status(
    df: DataFrame,
    earlier_than: str | None = None,
    later_than: str | None = None,
    version_col: str = "version",
) -> DataFrame:
    """F3: add `filter_status` column from the configured bounds."""
    return df.withColumn(
        "filter_status",
        filter_status_col(
            F.col(version_col),
            parse_filter_bound(earlier_than),
            parse_filter_bound(later_than),
        ),
    )


def anti_join_existing(
    df: DataFrame,
    existing: DataFrame,
    keys: tuple[str, ...] = ("table", "key_hex", "version"),
) -> DataFrame:
    """F4: drop records already present in the sink snapshot.

    The scalable twin of HbaseClient.nonExistent's batched existsAll GETs
    (HbaseClient.kt:43-52): a left_anti join on (table, key, version).
    Hash keys are uniformly distributed (CRC-prefixed), so the shuffle is
    skew-free; when the existing snapshot is small Catalyst broadcasts it.
    """
    return df.join(existing.select(*keys).dropDuplicates(list(keys)), list(keys), "left_anti")


def valid_records(df: DataFrame) -> DataFrame:
    """F1+F2: keep parseable records with usable ids."""
    return df.filter(F.col("valid"))


def filter_counts(df: DataFrame, by: tuple[str, ...] = ("db", "collection", "file_number")) -> DataFrame:
    """F5: per-file accounting of put/filtered counts
    (HBaseWriter.kt:309-314) — one aggregation over the whole run instead
    of per-file mutable counters."""
    return (
        df.groupBy(*[F.col(c) for c in by])
        .agg(
            F.count(F.lit(1)).alias("records_total"),
            F.count_if(F.col("skip_reason") == "parse_error").alias("parse_errors"),
            F.count_if(F.col("skip_reason") == "date_error").alias("date_errors"),
            F.count_if(F.col("skip_reason") == "blank_id").alias("blank_ids"),
            F.count_if(
                F.col("valid") & (F.col("filter_status") == FILTER_NOT)
            ).alias("put_count"),
            F.count_if(F.col("filter_status") == FILTER_TOO_EARLY).alias(
                "filtered_too_early"
            ),
            F.count_if(F.col("filter_status") == FILTER_TOO_LATE).alias(
                "filtered_too_late"
            ),
        )
    )

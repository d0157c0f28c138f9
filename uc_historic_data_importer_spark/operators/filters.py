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
    we pin UTC. Blank -> None (unbounded). A NON-BLANK value that does
    not parse raises — the reference's ParseException equivalent: a
    typo'd bound must fail the run, not silently disable the filter
    and import everything."""
    if not value or not value.strip():
        return None
    v = value.strip()
    # parse as-is FIRST: the shared parser also accepts the '+0000'
    # offset format, and unconditionally appending 'Z' would turn that
    # well-formed bound into '...+0000Z' and reject it
    millis = parse_hdi_timestamp_millis(v)
    if millis is None and not v.endswith("Z"):
        millis = parse_hdi_timestamp_millis(v + "Z")
    if millis is None:
        raise ValueError(
            f"unparseable time-range filter bound: {value!r} "
            "(expected yyyy-MM-dd'T'HH:mm:ss.SSS['Z'])"
        )
    return millis


def filter_status_col(
    version: Column,
    earlier_than_millis: int | None,
    later_than_millis: int | None,
) -> Column:
    """FilterServiceImpl.filterStatus (:24-37): strict bounds; the 1980
    epoch sentinel is exempt from the too-early filter (no-timestamp
    records may in fact be recent)."""
    lo, hi = earlier_than_millis, later_than_millis
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
    No dedup of the snapshot side: left_anti output is identical whether
    or not the right side has duplicates, and the aggregate would cost a
    full extra shuffle of the snapshot at scale.
    """
    if not keys:
        # pre-guard (r13 review batch 6): empty keys crashed as a bare
        # IndexError inside the join instead of naming the
        # misconfiguration
        raise ValueError("keys must be non-empty")
    return df.join(existing.select(*keys), list(keys), "left_anti")


def mark_existing(
    df: DataFrame,
    existing: DataFrame,
    keys: tuple[str, ...] = ("table", "key_hex", "version"),
) -> DataFrame:
    """F4 as a STATUS, not a drop: rows whose (table, key, version)
    already exists in the sink snapshot get filter_status=FilterExists
    (only where the time-range filter passed them — the reference's
    exists check runs after the range gate, HBaseWriter.kt:549-552), so
    the F5 accounting can report filtered_exists and put_count matches
    the rows actually delivered to the sink. The snapshot side IS
    deduplicated here: a plain left join against duplicate keys would
    multiply the left rows."""
    if not keys:
        # same bare-IndexError class as anti_join_existing (r13 review)
        raise ValueError("keys must be non-empty")
    marker = (
        existing.select(*keys).distinct().withColumn("_exists", F.lit(1))
    )
    out = df.join(marker, list(keys), "left")
    status = F.when(
        (F.col("filter_status") == FILTER_NOT) & F.col("_exists").isNotNull(),
        F.lit(FILTER_EXISTS),
    ).otherwise(F.col("filter_status"))
    return out.withColumn("filter_status", status).drop("_exists")


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
            F.count_if(F.col("filter_status") == FILTER_EXISTS).alias(
                "filtered_exists"
            ),
        )
    )

"""Snapshot reconciliation: keyed diff between two table versions.

The operational twin of the exists-filter (F4): after a backfill, a
migration, or an idempotent re-import (reference semantics: re-running
the job must not change the sink — `HbaseClient.kt:43-52` existsAll),
you want to PROVE two snapshots agree, and if not, see exactly how they
differ. This computes, per key: added / removed / changed / unchanged.

Shape at 100 TB: each side reduces to (key, row_hash) map-side — the
full-width rows never shuffle, only 16-byte hashes do — then ONE
full-outer join on the key. Co-partitioned (bucketed) snapshots join
without any exchange at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed_hash(df: DataFrame, key_cols: tuple[str, ...], side: str) -> DataFrame:
    value_cols = [c for c in df.columns if c not in key_cols]
    # md5 over the concatenated values: engine-portable (oracle mirrors
    # it); unit separator avoids ("ab","c")==("a","bc") ambiguity, and a
    # null sentinel keeps NULL != '' distinctions
    payload = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in value_cols]
    )
    return df.select(*key_cols, F.md5(payload).alias(f"hash_{side}"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
) -> DataFrame:
    """Per-key diff status between two snapshots with identical schemas.

    Returns (key_cols..., status) with status in
    {'added', 'removed', 'changed', 'unchanged'}.
    """
    o = _keyed_hash(old, key_cols, "old")
    n = _keyed_hash(new, key_cols, "new")
    joined = o.join(n, list(key_cols), "full_outer")
    status = (
        F.when(F.col("hash_old").isNull(), F.lit("added"))
        .when(F.col("hash_new").isNull(), F.lit("removed"))
        .when(F.col("hash_old") == F.col("hash_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame, new: DataFrame, key_cols: tuple[str, ...]
) -> DataFrame:
    """Reconciliation report: row counts per diff status."""
    return (
        snapshot_diff(old, new, key_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )

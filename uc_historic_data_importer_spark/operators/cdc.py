"""Changelog merge (CDC apply): fold an ordered put/delete change stream
into a snapshot table.

The reference is the HISTORIC side of a CDC pair: it bulk-loads a Mongo
dump into versioned KV cells, and its production sibling then applies
incremental Kafka updates to the same table (SURVEY.md §1.1 — the
`k2hb`-style companion the manifest reconciles against). This operator is
that incremental apply re-expressed relationally: given

    snapshot(key, payload...)                 — the imported table
    changes(key, seq, op, payload...)         — ordered log, op in (P, D)

produce the post-log table: for every key the latest change (max seq)
wins — a ``P`` (put) upserts its payload, a ``D`` (delete tombstone)
removes the key; keys with no change keep their snapshot row. This is
exactly HBase-put/delete semantics (reference `HBaseWriter.kt` puts with
version timestamps; deletes are tombstone versions), and Delta/Iceberg
``MERGE INTO`` semantics for the relational world.

Scale shape: one shuffle to reduce the log to latest-per-key (map-side
partial ``max(struct(seq, ...))`` — the log compacts before it moves),
then one equi-join with the snapshot on the same key. The join reuses
the aggregation's hash partitioning (no second shuffle of the change
side); a snapshot bucketed/partitioned on the key joins without moving
at all. No windows, no skew-prone keys (primary keys are unique), no
driver state — at 100 TB the cost is one pass over the log plus one
co-partitioned join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_PUT = "P"
OP_DELETE = "D"


def latest_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Compact the changelog to one winning row per key.

    The winner is the max-``seq`` change; ties (same seq for one key —
    an upstream bug, but determinism must survive it) break on
    (op, payload...) lexicographically via the struct ordering, so the
    result is stable across retries and partitionings. One groupBy with
    map-side partial aggregation: the shuffle moves one struct per
    (partition, key), not the raw log."""
    keys = list(key_cols)
    payload = [c for c in changes.columns if c not in (*keys, seq_col, op_col)]
    packed = F.max(
        F.struct(
            F.col(seq_col).alias(seq_col),
            F.col(op_col).alias(op_col),
            *[F.col(c).alias(c) for c in payload],
        )
    ).alias("_w")
    return changes.groupBy(*keys).agg(packed).select(
        *keys,
        F.col(f"_w.{seq_col}").alias(seq_col),
        F.col(f"_w.{op_col}").alias(op_col),
        *[F.col(f"_w.{c}").alias(c) for c in payload],
    )


def merge_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply the changelog to the snapshot (MERGE INTO semantics).

    Output columns = snapshot columns. For payload columns present in
    the changelog, the winning put's value replaces the snapshot value
    (including explicit NULLs — the ``op`` discriminator, never
    ``coalesce``, decides which side wins, so a put may null a field).
    Snapshot columns absent from the changelog pass through (NULL on
    inserted keys). Deletes drop the key even if it was inserted and
    re-deleted purely inside the log; a put after a delete resurrects.
    """
    keys = list(key_cols)
    latest = latest_changes(changes, keys, seq_col, op_col)
    change_payload = {c for c in latest.columns if c not in (*keys, seq_col, op_col)}
    joined = snapshot.alias("s").join(latest.alias("c"), on=keys, how="full_outer")
    live = joined.filter(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != OP_DELETE)
    )
    out = []
    for c in snapshot.columns:
        if c in keys:
            out.append(F.col(c))
        elif c in change_payload:
            out.append(
                F.when(F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}"))
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
            )
        else:
            out.append(F.col(f"s.{c}").alias(c))
    return live.select(*out)

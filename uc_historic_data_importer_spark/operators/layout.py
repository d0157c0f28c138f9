"""Multi-dimensional data layout: Z-order (Morton) keys for
data-skipping writes.

At 100 TB the cheapest predicate is the one that never reads a file:
parquet row-group/file min-max stats prune scans, but only if the write
layout clusters each filter column. Sorting by one column clusters that
column alone; interleaving the bits of k columns into one Morton key and
range-partitioning + sorting by it clusters ALL k at once — every file
covers a small hyper-rectangle of the key space, so min-max pruning
works for predicates on any interleaved dimension (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout, public technique from Morton 1966 /
Databricks docs).

Everything here is a pure Catalyst bit expression (whole-stage codegen,
map-only); the layout write is ``repartitionByRange`` on the key (range
exchange with sampled bounds — the only shuffle) + an in-partition sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Callers pre-scale values into [0, 2^bits) — ranks, bucketized
    floats, or ``x % 2^bits`` for already-uniform ids. k * bits must fit
    a signed long (k=2, bits=16 -> 32-bit keys; k=4, bits=15 -> 60).
    Bit j of column i lands at position j*k + i, so high bits of every
    dimension dominate equally — locality in the key implies locality in
    every dimension."""
    k = len(cols)
    if k < 1 or bits < 1:
        # pre-guard (r13 review batch 6): bits=0 or zero columns made
        # the key the CONSTANT 0 for every row (probed) — the range
        # partitioner then puts the whole table in one partition,
        # silently defeating the data-skipping layout this key exists
        # for
        raise ValueError(
            f"need >= 1 column and bits >= 1 (got {k} cols, bits={bits})"
        )
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits overflows a signed long")
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, j * k + i)
    return z


def zorder_key_sql(exprs: Sequence[str], bits: int = 16) -> str:
    """DuckDB SQL computing the same Morton key (oracle parity)."""
    k = len(exprs)
    # parity guards: the oracle builder must reject exactly what
    # zorder_key rejects, or a misconfigured query would raise on one
    # engine and silently compute on the other
    if k < 1 or bits < 1:
        raise ValueError(
            f"need >= 1 expr and bits >= 1 (got {k} exprs, bits={bits})"
        )
    if k * bits > 62:
        raise ValueError(f"{k} exprs x {bits} bits overflows a signed long")
    # every term fully parenthesized: SQL `<<` binds looser than `+`,
    # so an unparenthesized `a << 3 + b << 5` re-associates the shifts.
    # Each expr is CAST to BIGINT to match the Spark side's .cast
    # ("long"): an INTEGER-typed expr would make DuckDB raise
    # 'Overflow in left shift' at bit positions >= 31 (verified live)
    terms = [
        f"((((CAST(({e}) AS BIGINT)) >> {j}) & 1) << {j * k + i})"
        for j in range(bits)
        for i, e in enumerate(exprs)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    bits: int = 16,
    key_name: str = "_z",
) -> DataFrame:
    """Cluster ``df`` for a data-skipping write: compute the Morton key
    over ``cols`` (each taken mod 2^bits — callers with non-uniform
    domains should rank/bucketize first), range-partition into
    ``num_files`` key ranges and sort within each. Writing the result
    yields one tight hyper-rectangle of min-max stats per file; the key
    column is kept so tests/audits can assert the clustering, and is
    cheap to drop before the write.

    NULLs cluster at bucket 0 of their dimension (coalesce-to-0): an
    un-coalesced NULL would null the ENTIRE interleaved key — one NULL
    in any single z-column and the row falls out of the layout into
    the first range partition, unsorted on the other k-1 dimensions.
    At a 20%-NULL column that is 20% of the table in one skewed
    unclustered file, silently defeating the data skipping this write
    exists for."""
    # reserved-name guard (r10 review, the skew.py class): withColumn
    # would silently REPLACE an input column named like the key output
    if key_name in df.columns:
        raise ValueError(
            f"input column {key_name!r} collides with zorder_layout's "
            "key output; pass a different key_name or rename the column"
        )
    mask = (1 << bits) - 1
    key = zorder_key(
        [
            F.coalesce(F.col(c).cast("long"), F.lit(0).cast("long")).bitwiseAND(
                F.lit(mask).cast("long")
            )
            for c in cols
        ],
        bits,
    )
    return (
        df.withColumn(key_name, key)
        .repartitionByRange(num_files, F.col(key_name))
        .sortWithinPartitions(key_name)
    )

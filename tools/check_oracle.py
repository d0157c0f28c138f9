#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every queries()
entry in Spark AND its oracle_sql() in DuckDB at a given sf dir, compare
row count, column names (sorted), and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-unknown float normalization: use repr of rounded value
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def connect_oracle(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    return con


def check_queries(spark, con, sf_dir, queries, oracles, only=(), quiet=False):
    """Compare each query against its oracle; returns failing names.

    Shared by the CLI below and the per-round regression pytest
    (tests/test_oracle_regression.py), so 'passes locally' and 'passes
    in CI' are the same check."""
    only = set(only)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        spark_s = time.time() - t0

        if name not in oracles:
            if not quiet:
                print(f"{name:28s} rows-only: {len(srows)} rows ({spark_s:.1f}s)")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        otypes = [str(d[1]) for d in cur.description]
        orows = cur.fetchall()
        duck_s = time.time() - t0

        problems = []
        # DuckDB renders integer sum() as HUGEINT/int128; pandas-based
        # harnesses (like the driver) coerce HUGEINT to float64, so
        # "3" becomes "3.0" and the value hash breaks even though the
        # math is right. fetchall() hides this (HUGEINT -> Python int),
        # so detect the type directly: any HUGEINT output column must be
        # CAST(... AS BIGINT) in the oracle SQL.
        for c, ty in zip(ocols, otypes):
            if "HUGEINT" in ty.upper() or "INT128" in ty.upper():
                problems.append(
                    f"oracle col {c} is {ty}: cast to BIGINT "
                    "(pandas renders HUGEINT as float)"
                )
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh = value_hash([r[:] for r in srows], scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                srt = sorted(range(len(scols)), key=lambda i: scols[i])
                ort = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(norm_cell(r[i]) for i in srt) for r in srows)
                oset = sorted("|".join(norm_cell(r[i]) for i in ort) for r in orows)
                diff = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                for a, b in diff:
                    problems.append(f"  spark: {a[:160]}")
                    problems.append(f"  duck : {b[:160]}")
        status = "OK " if not problems else "FAIL"
        if not quiet or problems:
            print(
                f"{name:28s} {status} {len(srows)} rows "
                f"(spark {spark_s:.1f}s, duck {duck_s:.2f}s)"
            )
            for p in problems:
                print(f"    {p}")
        if problems:
            failures.append(name)
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    import __spark_entry__ as entry_mod

    from uc_historic_data_importer_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = connect_oracle(sf_dir)
    failures = check_queries(
        spark, con, sf_dir, entry_mod.queries(), entry_mod.oracle_sql(), only=only
    )
    print()
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()

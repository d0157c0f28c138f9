#!/usr/bin/env python
"""Synthesize an sf1-scale dataset (~10x sf0.1) for scale soaks.

Replicates /root/testdata/sf0.1 with join-consistent key offsets:
fact-table keys shift per copy (so the key space really grows 10x and
joins stay referentially intact), dimension tables stay fixed (copies
fan out onto the same dims, preserving join selectivity). Offsets are
multiples of every modulus the catalog queries sample on (% 5, % 9,
% 16, % 20, % 256, % 1000), so samplers keep their rates.

Usage: python tools/make_scale.py [copies] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# per-copy key offsets; divisible by 720720 (= lcm(5,9,16,11,13,7)) x
# powers of 10 where queries use %1000/%256-style sampling
K_ORDER = 10_000_000
K_CUST = 1_000_000
K_EVENT = 10_000_000
K_USER = 1_000_000
K_DOC = 720_720_0  # 7207200: divisible by 5,9,16,32,1000? see note
K_VEC = 20_000

# documents use doc_id % 9 and % 16 and % 256 in media queries;
# 7207200 % 9 == 0, % 16 == 0, % 256 != 0 — bench-only, no oracle run
# at this scale, so the slight %256 phase shift is acceptable.


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hdi_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    fixed = ["region", "nation", "supplier", "part"]
    for t in fixed:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print("copied dim", t)

    def scale(table: str, select_tpl: str) -> None:
        parts = " UNION ALL ".join(
            select_tpl.format(c=c) for c in range(copies)
        )
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print("scaled", table, n)

    scale(
        "customer",
        f"SELECT * REPLACE (c_custkey + {{c}} * {K_CUST} AS c_custkey) "
        f"FROM read_parquet('{SRC}/customer.parquet')",
    )
    scale(
        "orders",
        f"SELECT * REPLACE (o_orderkey + {{c}} * {K_ORDER} AS o_orderkey, "
        f"o_custkey + {{c}} * {K_CUST} AS o_custkey) "
        f"FROM read_parquet('{SRC}/orders.parquet')",
    )
    scale(
        "lineitem",
        f"SELECT * REPLACE (l_orderkey + {{c}} * {K_ORDER} AS l_orderkey) "
        f"FROM read_parquet('{SRC}/lineitem.parquet')",
    )
    scale(
        "events",
        f"SELECT * REPLACE (event_id + {{c}} * {K_EVENT} AS event_id, "
        f"user_id + {{c}} * {K_USER} AS user_id) "
        f"FROM read_parquet('{SRC}/events.parquet')",
    )
    scale(
        "documents",
        f"SELECT * REPLACE (doc_id + {{c}} * {K_DOC} AS doc_id) "
        f"FROM read_parquet('{SRC}/documents.parquet')",
    )
    scale(
        "embeddings",
        f"SELECT * REPLACE (vec_id + {{c}} * {K_VEC} AS vec_id) "
        f"FROM read_parquet('{SRC}/embeddings.parquet')",
    )
    print("done ->", out)


if __name__ == "__main__":
    main()

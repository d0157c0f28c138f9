"""Every-round oracle regression over the FULL query catalog.

The driver's correctness gate samples 50 queries per round, so a query
recorded green in an earlier round could silently regress without any
red row appearing in the next record. This test closes that gap: it
runs every ``queries()`` entry against its ``oracle_sql()`` in DuckDB
at sf0.001 (the smallest driver-generated scale) using the exact same
comparison code as tools/check_oracle.py — row count, sorted column
names, order-insensitive value hash, and the HUGEINT rendering lint.

sf0.001 keeps per-query cost low (sub-second plans); the whole sweep is
one Spark session + one DuckDB connection. Queries are exercised at
driver parity, not approximated.
"""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

SF_DIR = os.environ.get("SPARK_GRAFT_REGRESSION_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)


def test_all_catalog_queries_match_oracles(spark):
    import __spark_entry__ as entry_mod
    from check_oracle import check_queries, connect_oracle

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # The streaming query builds its own file fixture and measures
    # convergence; its batch-equivalence is pinned separately in
    # tests/test_streaming.py.
    queries = {
        k: v for k, v in queries.items() if k != "streaming_latest_per_key"
    }
    con = connect_oracle(SF_DIR)
    failures = check_queries(
        spark, con, SF_DIR, queries, oracles, quiet=True
    )
    assert not failures, f"oracle regressions: {failures}"


ARROW_SEAM_SF = "/root/testdata/sf0.1"
# catalog queries whose similarity operators dispatch to the Arrow
# matmul seam past 1000 corpus rows (ivf_topk / ivf2_fit / ivf2_assign /
# cosine_neardup_pairs / semdedup): sf0.1's embeddings table has 2000
# rows, so THIS oracle run executes the FlatMap*Pandas branch — the
# driver's own correctness scales (sf0.001/sf0.01) stay on the exact
# Catalyst path and never see it (r14 verdict item 2).
ARROW_SEAM_QUERIES = (
    "ann_ivf_topk",
    "ann_ivf2_build",
    "ann_ivf2_topk",
    "embedding_cosine_neardup",
    "semdedup_embeddings",
)


@pytest.mark.skipif(
    not os.path.isdir(ARROW_SEAM_SF), reason=f"{ARROW_SEAM_SF} not present"
)
def test_arrow_seam_queries_match_oracles_past_dispatch_threshold(spark):
    import __spark_entry__ as entry_mod
    from check_oracle import check_queries, connect_oracle

    queries = entry_mod.queries()
    # the seam branch must actually be the one executing: assert the
    # dispatch plan contains a pandas node before trusting the hashes
    plan = (
        queries["ann_ivf_topk"](spark, ARROW_SEAM_SF)
        ._jdf.queryExecution()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan or "FlatMapCoGroupsInPandas" in plan
    con = connect_oracle(ARROW_SEAM_SF)
    failures = check_queries(
        spark,
        con,
        ARROW_SEAM_SF,
        queries,
        entry_mod.oracle_sql(),
        only=ARROW_SEAM_QUERIES,
        quiet=True,
    )
    assert not failures, f"arrow-seam oracle regressions: {failures}"

"""Driver-contract guard: entry() smoke + a fast oracle-comparison subset
(the full sweep lives in tools/check_oracle.py)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "latest_per_key",
    "time_range_filter",
    "normalize_pipeline",
    "pricing_summary",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "salted_agg_counts",
    "event_sessionization",
    "ann_ivf_build",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"collection", "n_current_keys", "max_version"}


def test_every_query_has_callable_and_most_have_oracles():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 40
    missing = set(oracles) - set(qs)
    assert not missing  # no orphan oracle
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()  # every query is value-hash oracle-checked


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle_at_sf0001(spark, duck, name):
    import math

    qs = entry_mod.queries()
    sdf = qs[name](spark, SF_DIR)
    srows = sdf.collect()
    cur = duck.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), name
    assert sorted(sdf.columns) == sorted(ocols), name

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            cells = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    v = "NaN" if math.isnan(v) else repr(round(v, 9))
                cells.append(str(v))
            out.append("|".join(cells))
        return sorted(out)

    assert norm([tuple(r) for r in srows], sdf.columns) == norm(orows, ocols), name

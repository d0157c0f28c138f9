"""Pair-parity pins for the LSH-bucketed semantic decontamination route
vs the exact (broadcast crossJoin) path, plus the empty-eval guard.

Parity contract: LSH candidate similarities are EXACT cosines, so
  - max_cand_sim <= max_test_sim for every train row (lower bound), and
  - every LSH-contaminated id is exact-contaminated (no false positives);
recall is the standard sign-LSH tradeoff and is pinned loosely so a
plane/bucket regression (e.g. a seed change) fails loudly.
"""

from pyspark.sql import functions as F

from uc_historic_data_importer_spark.operators.similarity import (
    semantic_decontamination,
    semantic_decontamination_lsh,
)

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.3


def _split(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    test = emb.filter(F.col("vec_id") % 20 == 0)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    return train, test


def test_lsh_is_exact_lower_bound_and_no_false_positives(spark):
    train, test = _split(spark)
    exact = {
        r["vec_id"]: r
        for r in semantic_decontamination(
            train, test, threshold=THRESHOLD
        ).collect()
    }
    lsh = {
        r["vec_id"]: r
        for r in semantic_decontamination_lsh(
            train, test, threshold=THRESHOLD
        ).collect()
    }
    assert set(lsh) == set(exact)  # every train row present on both paths
    flagged_exact = {i for i, r in exact.items() if r["contaminated"] == 1}
    flagged_lsh = {i for i, r in lsh.items() if r["contaminated"] == 1}
    assert flagged_lsh <= flagged_exact  # no false positives
    for i, r in lsh.items():
        if r["max_cand_sim"] is not None:
            # candidate sims are exact cosines -> bounded by the true max
            assert r["max_cand_sim"] <= exact[i]["max_test_sim"] + 1e-9, i
    # loose recall pin: 4 tables x 4 planes measures 0.486 on this
    # corpus (most truly-contaminated rows sit just above the 0.3
    # threshold, where sign-LSH collision probability is weakest); the
    # pin guards against a seed/bucket regression collapsing it to ~0,
    # not against the inherent LSH tradeoff
    if flagged_exact:
        recall = len(flagged_lsh) / len(flagged_exact)
        assert recall >= 0.4, (recall, len(flagged_exact))


def test_lsh_never_candidate_rows_survive(spark):
    train, test = _split(spark)
    out = semantic_decontamination_lsh(train, test, threshold=THRESHOLD)
    n_train = train.count()
    assert out.count() == n_train
    # never-candidate rows carry NULL max_cand_sim and contaminated=0
    nulls = out.filter(F.col("max_cand_sim").isNull())
    assert nulls.filter(F.col("contaminated") != 0).count() == 0


def test_exact_empty_eval_guard(spark):
    train, test = _split(spark)
    empty = test.filter(F.lit(False))
    out = semantic_decontamination(train, empty, threshold=THRESHOLD)
    rows = out.collect()
    assert len(rows) == train.count()  # whole corpus kept, not dropped
    assert all(r["contaminated"] == 0 for r in rows)
    assert all(r["max_test_sim"] is None for r in rows)


def test_lsh_empty_train_guard(spark):
    # round-5 advice: empty train frame must return an empty flagged
    # frame, not crash on first() -> None while probing the vector dim
    train, test = _split(spark)
    empty = train.filter(F.lit(False))
    out = semantic_decontamination_lsh(empty, test, threshold=THRESHOLD)
    assert out.columns == ["vec_id", "max_cand_sim", "contaminated"]
    # dtypes must match the normal path (int flag, not boolean) so the
    # two branches union/append cleanly
    assert dict(out.dtypes)["contaminated"] == "int"
    assert dict(out.dtypes)["max_cand_sim"] == "double"
    assert out.count() == 0


def test_hyperplane_lsh_empty_corpus_returns_empty_frame(spark):
    """r9 review: an empty corpus crashed the dim probe with
    TypeError int(None); bucketing nothing is well-defined — the empty
    (vec_id, bucket) frame with the normal schema."""
    from uc_historic_data_importer_spark.operators.similarity import (
        hyperplane_lsh_buckets,
    )

    df = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = hyperplane_lsh_buckets(df)
    assert out.columns == ["vec_id", "bucket"]
    assert dict(out.dtypes)["bucket"] == "bigint"
    assert out.count() == 0


def test_pq_fit_empty_or_null_first_embedding_raises_clearly(spark):
    """r9 review: pq_fit over an empty corpus (or a NULL first
    embedding) crashed with TypeError int(None) — a fit over nothing is
    a caller error and must say so."""
    import pytest

    from uc_historic_data_importer_spark.operators.pq import pq_fit

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        pq_fit(empty)
    nulls = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="NULL first embedding"):
        pq_fit(nulls)

"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (it's the small side by construction), so the
  plan is a broadcast nested-loop + per-query top-k: no shuffle of the
  corpus, scales linearly with corpus size per query.
- `ivf_topk`: IVF-style partitioned search — candidates restricted to the
  query's cell (here the precomputed `label` column stands in for the
  coarse quantizer's assignment; at 100 TB the cell id comes from a
  k-means fit and the corpus is PARTITIONED BY cell on disk, so a probe
  reads only its cells' files — partition pruning does the work).
- `hyperplane_lsh_buckets`: random-hyperplane LSH bucketing with
  deterministic pseudo-planes derived from the shared md5 hash — the
  shuffle-free approximate path when no index exists.

Dot products run through `F.aggregate`/`zip_with` on DOUBLE — JVM-side,
sequential summation (bit-identical to the DuckDB oracle's
list_inner_product over DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """Similarity parallelism equals corpus partitions; a single-file
    corpus would serialize the dot-product stage onto one core. No-op at
    real scale (inputs already have many splits)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact brute-force top-k: (query_id, neighbor_id, cos_sim, rank).

    Norms are precomputed per side BEFORE the join (1 dot product per
    pair instead of 3 — same double values, sqrt is deterministic).
    Similarity is rounded BEFORE ranking so cross-engine float noise
    cannot flip ranks; ties break on neighbor id ascending."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_col(F.col(vec_col)).alias("q_norm"),
        )
    )
    c = _ensure_parallel(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_col(F.col(vec_col)).alias("c_norm"),
    )
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_col(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """IVF search: nearest neighbors within the same quantizer cell.

    The equi-join on cell id replaces the cross join — each cell's
    candidate set is independent, so the shuffle is on the (uniform)
    cell id and partition pruning applies when the corpus is stored
    partitioned by cell."""
    corpus = _ensure_parallel(corpus)
    a = corpus.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_col(F.col(vec_col)).alias("q_norm"),
        F.col(cell_col).alias("cell"),
    )
    b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_col(F.col(vec_col)).alias("c_norm"),
        F.col(cell_col).alias("cell"),
    )
    sims = (
        a.join(b, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            F.round(
                dot_col(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_lsh_buckets(
    corpus: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id per vector: bit p = (dot(v, plane_p) > 0).

    Pseudo-random plane coefficients are deterministic integer-derived
    values in [-0.5, 0.5): coeff(p, i) = ((md5_i64 of "p:i") % 1000)/1000
    - 0.5 — reproducible in any engine, no RNG state to ship. Vectors in
    the same bucket are near-duplicate candidates (cos-LSH property)."""
    import hashlib

    dim_probe = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_probe["d"])

    def coeff(p: int, i: int) -> float:
        h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16)
        return (h % 1000) / 1000.0 - 0.5

    bucket = F.lit(0).cast("long")
    v = F.col(vec_col)
    for p in range(n_planes):
        plane = F.array(*[F.lit(coeff(p, i)) for i in range(dim)])
        d = dot_col(v, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return corpus.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))

"""Deterministic sampling / split assignment for training-data pipelines.

A 100 TB corpus pipeline needs samples and splits that are (a) stable
across reruns and cluster sizes — no RNG, no partition-order dependence
(``df.sample`` gives neither: its seed interacts with partitioning), and
(b) pure map-side — no shuffle just to pick a subset. Everything here
keys off the shared engine-portable ``md5_i64`` hash of a stable id
(functions/hashes.py), so the DuckDB oracle reproduces every selection
bit-for-bit and a rerun on different hardware picks the same rows.

The reference has no sampling operators (its job is a full import); this
module is part of the training-data extension surface alongside dedup /
similarity / text (build brief), reusing its hash conventions.

Three operators:

- ``hash_sample``: Bernoulli-style p-fraction sample. bucket =
  h mod D; keep bucket < p*D. Map-only, scales to any size.
- ``split_assign``: train/val/test labels from disjoint hash ranges —
  a document can never migrate between splits when the corpus grows,
  because its label depends only on its own id.
- ``stratified_sample``: exactly n per stratum, rows ranked by hash
  within the stratum — deterministic "random" without an RNG. This one
  shuffles (per-group ranking is a real global operation); the rank
  window partitions by stratum so it is one shuffle of the strata keys.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uc_historic_data_importer_spark.functions.hashes import md5_i64

# hash buckets for fraction selection: p is quantized to 1/DENOM steps
DENOM = 1_000_000


def _check_reserved(df: DataFrame, reserved: set[str], op: str) -> None:
    """skew.py-style reserved-name guard (r11 review batch): withColumn
    silently OVERWRITES an input column named like an internal temp (or
    a documented output) — raise with a rename hint instead."""
    taken = reserved & set(df.columns)
    if taken:
        raise ValueError(
            f"input columns {sorted(taken)} collide with {op}'s internal "
            "temp names; rename them first"
        )


def _bucket(id_col: str):
    return md5_i64(F.col(id_col).cast("string")) % F.lit(DENOM)


def _mixture_levels(w: float) -> tuple[int, int]:
    """Weight -> (n_full_copies, fractional 1/DENOM threshold) — THE
    float-to-int split both mixture_sample and its DuckDB twin
    mixture_sql must share: a drifted copy (round vs floor on the
    fractional part) would silently diverge the engines at weight
    boundaries."""
    n_full = int(math.floor(w))
    return n_full, int(round((w - n_full) * DENOM))


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — map-only, rerun-stable."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(id_col) < F.lit(int(fraction * DENOM)))


def split_assign(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.01,
    test_fraction: float = 0.01,
    out_col: str = "split",
) -> DataFrame:
    """Label each row train/val/test by disjoint hash ranges of its id.

    Membership is a pure function of the id: adding or removing other
    rows never moves a document across the val/test boundary (the
    train-test contamination guarantee a growing corpus needs).
    """
    if val_fraction < 0 or test_fraction < 0:
        raise ValueError("val/test fractions must be >= 0")
    if val_fraction + test_fraction >= 1.0:
        raise ValueError("val + test fractions must leave room for train")
    _check_reserved(df, {out_col}, "split_assign")
    b = _bucket(id_col)
    val_hi = int(val_fraction * DENOM)
    test_hi = val_hi + int(test_fraction * DENOM)
    return df.withColumn(
        out_col,
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, picked by hash rank.

    The hash is the sort key, so the picked set is a deterministic
    pseudo-random subset; the id tiebreak makes rank total even on the
    (improbable) hash collision. One shuffle, partitioned by stratum —
    skewed strata are bounded by the same salting approach as
    operators/skew.py if a stratum outgrows an executor.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1: {n_per_stratum}")
    _check_reserved(df, {"_rk"}, "stratified_sample")
    w = Window.partitionBy(stratum_col).orderBy(
        md5_i64(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def sample_sql(id_expr: str, fraction: float) -> str:
    """DuckDB predicate matching hash_sample's selection."""
    from uc_historic_data_importer_spark.functions.hashes import md5_i64_sql

    h = md5_i64_sql(f"CAST({id_expr} AS VARCHAR)")
    return f"({h} % {DENOM}) < {int(fraction * DENOM)}"


def split_sql(id_expr: str, val_fraction: float, test_fraction: float) -> str:
    """DuckDB CASE expression matching split_assign's labels."""
    from uc_historic_data_importer_spark.functions.hashes import md5_i64_sql

    h = md5_i64_sql(f"CAST({id_expr} AS VARCHAR)")
    val_hi = int(val_fraction * DENOM)
    test_hi = val_hi + int(test_fraction * DENOM)
    return (
        f"CASE WHEN ({h} % {DENOM}) < {val_hi} THEN 'val' "
        f"WHEN ({h} % {DENOM}) < {test_hi} THEN 'test' "
        f"ELSE 'train' END"
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-mixture construction (DoReMi-style reweighting): emit each
    row round(weight) times deterministically — weight 2.5 yields 2 full
    copies plus a third kept for half the ids; weight 0.25 keeps a
    quarter of the domain; weight 0 drops it.

    Fractional membership keys off md5_i64(id:copy), so the mixture is
    rerun-stable, growth-stable, and engine-portable like every sampler
    here. Map-only with bounded fan-out (ceil(max weight) copies); the
    epoch/copy index is returned so downstream packing can interleave
    copies instead of clustering them. Weights are resolved to integer
    thresholds at plan build — no float comparison at runtime (float to
    int casts round in some engines and truncate in others).
    """
    if any(
        not math.isfinite(w) for w in list(weights.values()) + [default_weight]
    ):
        # floor(nan/inf) raises deep inside _mixture_levels otherwise —
        # surface the configuration error at the API boundary
        raise ValueError("mixture weights must be finite")
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")
    _check_reserved(df, {"_n_full", "_thresh", "copy_idx"}, "mixture_sample")

    levels = _mixture_levels

    n_full_col = F.lit(levels(default_weight)[0])
    thresh_col = F.lit(levels(default_weight)[1])
    for dom, w in sorted(weights.items()):
        nf, th = levels(w)
        cond = F.col(domain_col) == dom
        n_full_col = F.when(cond, F.lit(nf)).otherwise(n_full_col)
        thresh_col = F.when(cond, F.lit(th)).otherwise(thresh_col)

    out = df.withColumn("_n_full", n_full_col).withColumn("_thresh", thresh_col)
    # fan-out exactly n_full copies plus ONE fractional candidate only
    # when there is a fractional part (_thresh > 0): an exact-integer
    # weight (incl. the default 1.0) must not explode an extra
    # always-filtered row per document. The empty-array guard covers
    # weight 0 (n_full = 0, thresh = 0): sequence(0, -1) DESCENDS in
    # Spark rather than returning empty, and exploding the empty array
    # drops the row outright — same result as the old filter, one row
    # cheaper
    upper = F.col("_n_full") - F.when(F.col("_thresh") > 0, 0).otherwise(1)
    out = out.withColumn(
        "copy_idx",
        F.explode(
            F.when(upper >= 0, F.sequence(F.lit(0), upper)).otherwise(
                F.array().cast("array<int>")
            )
        ),
    )
    frac_key = (
        md5_i64(
            F.concat_ws(":", F.col(id_col).cast("string"), F.col("copy_idx"))
        )
        % F.lit(DENOM)
    )
    return (
        out.filter(
            (F.col("copy_idx") < F.col("_n_full")) | (frac_key < F.col("_thresh"))
        )
        .drop("_n_full", "_thresh")
    )


def mixture_sql(
    weights: dict[str, float],
    domain_col: str = "source",
    id_expr: str = "doc_id",
    default_weight: float = 1.0,
) -> str:
    """DuckDB fragment reproducing mixture_sample over `documents`:
    returns (CTE body, WHERE predicate) as a single SELECT."""
    from uc_historic_data_importer_spark.functions.hashes import md5_i64_sql

    levels = _mixture_levels

    dnf, dth = levels(default_weight)
    if weights:
        nf_case = f"CASE {domain_col} "
        th_case = f"CASE {domain_col} "
        for dom, w in sorted(weights.items()):
            nf, th = levels(w)
            # '' doubling: a domain name containing a quote must stay a
            # literal, not become a syntax error (or injected SQL)
            lit = dom.replace("'", "''")
            nf_case += f"WHEN '{lit}' THEN {nf} "
            th_case += f"WHEN '{lit}' THEN {th} "
        nf_case += f"ELSE {dnf} END"
        th_case += f"ELSE {dth} END"
    else:
        # zero-branch CASE is invalid SQL; an empty weights dict means
        # every domain takes the default (mirrors mixture_sample)
        nf_case, th_case = str(dnf), str(dth)
    h = md5_i64_sql(f"(CAST({id_expr} AS VARCHAR) || ':' || CAST(copy_idx AS VARCHAR))")
    # range() upper bound mirrors mixture_sample's explode: n_full
    # copies plus one fractional candidate only when _thresh > 0
    # (range(0, 0) is empty in DuckDB, so weight-0 rows vanish here the
    # same way the empty-array explode drops them in Spark)
    return f"""
      SELECT * EXCLUDE (_n_full, _thresh)
      FROM (
        SELECT *, {nf_case} AS _n_full, {th_case} AS _thresh,
               unnest(range(0, ({nf_case})
                 + CASE WHEN ({th_case}) > 0 THEN 1 ELSE 0 END)) AS copy_idx
        FROM documents
      )
      WHERE copy_idx < _n_full OR ({h} % {DENOM}) < _thresh
    """


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_per_group: int,
    group_col: str | None = None,
    key_dp: int = 8,
) -> DataFrame:
    """Weighted sample without replacement, deterministic (A-ES scheme,
    Efraimidis & Spirakis 2006): each row gets key = ln(u) / w with u a
    hash-derived uniform in (0, 1], and the top-n keys win — selection
    probability proportional to weight, no RNG, rerun- and
    partitioning-stable.

    The key is rounded at ``key_dp`` BEFORE ranking (libm ``ln`` may
    differ in the last ulp across engines; the round + id tiebreak make
    the pick order total and oracle-reproducible). Non-positive weights
    are excluded — a zero-weight row must never be sampled and ln(u)/0
    is undefined. One shuffle, partitioned by group; when ``group_col``
    is None the global top-n goes through orderBy().limit(n)
    (TakeOrderedAndProject — per-partition top-n, n-way driver merge),
    never a single-reducer window.

    u must be strictly INSIDE (0, 1): at u = 1.0 the key is ln(1)/w = 0
    — the global maximum REGARDLESS of weight — so the ~1/DENOM of rows
    hashing to the top bucket would win weight-independently (round-6
    review fix: the denominator is DENOM + 1, putting u in
    [1/(DENOM+1), DENOM/(DENOM+1)]).

    NaN weights are excluded like non-positive ones (r13 review batch
    7): Spark's ordering puts NaN ABOVE every number, so `NaN > 0`
    passes the positivity filter and the NaN key then sorts as the
    GLOBAL MAXIMUM — probed: a NaN-weight row beat a weight-5.0 row.
    A +inf weight needs no special case: its key is -0.0, the
    legitimate top of the all-negative key range (P proportional to
    an infinite weight SHOULD always win).
    """
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1: {n_per_group}")
    _check_reserved(df, {"_wkey", "_rk"}, "weighted_sample")
    u = (_bucket(id_col) + 1).cast("double") / F.lit(float(DENOM + 1))
    wcol = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / wcol, key_dp)
    cand = df.filter((wcol > 0) & ~F.isnan(wcol)).withColumn("_wkey", key)
    if group_col is None:
        # an un-partitioned row_number window would funnel every
        # candidate through ONE task (the kmv_distinct pitfall);
        # orderBy().limit(n) plans as TakeOrderedAndProject —
        # per-partition top-n then an n-way driver merge
        return (
            cand.orderBy(F.desc("_wkey"), F.col(id_col))
            .limit(n_per_group)
            .drop("_wkey")
        )
    w = Window.partitionBy(group_col).orderBy(F.desc("_wkey"), F.col(id_col))
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_wkey", "_rk")
    )


def weighted_key_sql(id_expr: str, weight_expr: str, key_dp: int = 8) -> str:
    """DuckDB expression matching weighted_sample's ranking key
    (including its strictly-interior u: denominator DENOM + 1)."""
    from uc_historic_data_importer_spark.functions.hashes import md5_i64_sql

    h = md5_i64_sql(f"CAST({id_expr} AS VARCHAR)")
    return (
        f"round(ln((({h} % {DENOM}) + 1)::DOUBLE / {DENOM + 1}) / "
        f"({weight_expr})::DOUBLE, {key_dp})"
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    n_tokens_col: str,
    by: str = "source",
    id_col: str = "doc_id",
    cum_tokens_col: str = "cum_tokens",
) -> DataFrame:
    """Deterministic per-group token quota: walk each group's documents
    in hash order and keep the prefix whose cumulative token count stays
    within ``budget_tokens`` — the 'take N tokens per domain' primitive
    of training-mix construction, with no RNG (rerun- and cluster-size-
    stable order, same property as the other samplers here).

    Prefix semantics: a document that would cross the budget is dropped
    along with everything after it in hash order, so the sample can
    undershoot but never overshoots. One shuffle: the per-group running
    sum rides a single hash exchange on the group key.

    The running total is part of the sampler's contract (callers report
    'how many tokens did each domain actually get'), so it is exposed
    under the documented ``cum_tokens_col`` name — unlike the sibling
    samplers' `_wkey`/`_rk`, which are internal ranks and are dropped."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    _check_reserved(df, {cum_tokens_col}, "token_budget_sample")
    w = (
        Window.partitionBy(by)
        .orderBy(md5_i64(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(cum_tokens_col, F.sum(n_tokens_col).over(w))
        .filter(F.col(cum_tokens_col) <= budget_tokens)
    )


def temperature_mixture_sample(
    df: DataFrame,
    target_total: int,
    tau: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    rate_dp: int = 9,
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-LM sampling
    rule, Conneau & Lample style): domain s gets probability mass
    p_s = n_s^tau / sum(n^tau) — tau < 1 UP-samples the tail domains
    relative to raw proportions, tau = 1 is proportional, tau = 0 is
    uniform-by-domain. Per-row accept rate = min(1, target_total * p_s
    / n_s), hash-thresholded like every sampler here (rerun-stable,
    map-only after one tiny per-domain aggregate).

    The rate is rounded to ``rate_dp`` before quantization to the
    1/DENOM integer threshold so libm pow() ulp noise can never flip a
    row across engines. The per-domain frame is bounded by the domain
    count (broadcast side). Two passes over the input by construction
    (the counts aggregate, then the filter probe) — but the aggregate
    scan is column-pruned to ``domain_col`` alone, so at 100 TB the
    extra pass reads one column, not the corpus. A NULL domain is a
    domain like any other: it is counted, gets a rate, and its rows
    are kept at that rate (null-safe join — a plain equi-join would
    silently drop NULL-domain rows while still deflating every other
    domain's rate through the denominator)."""
    if not math.isfinite(tau) or tau < 0:
        # NaN slipped the old `tau < 0` check (NaN comparisons are
        # False) and pow(n, NaN) poisoned every rate — probed r13: the
        # sampler silently kept EVERY row
        raise ValueError(f"tau must be finite and >= 0 (got {tau})")
    if target_total < 1:
        # 0 or negative made every threshold <= 0 — probed r13: the
        # result was silently EMPTY (the relative_quality_filter
        # drop_frac class)
        raise ValueError(f"target_total must be >= 1 (got {target_total})")
    # mirror interval_join's reserved-name guard: an input frame already
    # carrying one of the internal temp columns would otherwise fail
    # with an opaque ambiguous-reference AnalysisException (or worse,
    # the final drop would remove the USER's column)
    reserved = {"_dom", "_thresh", "_n"}
    taken = reserved & set(df.columns)
    if taken:
        raise ValueError(
            f"input columns {sorted(taken)} collide with "
            "temperature_mixture_sample's internal temp names; rename "
            "them first"
        )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    denom = F.sum(F.pow(F.col("_n").cast("double"), F.lit(tau))).over(
        Window.partitionBy()
    )
    rates = counts.select(
        domain_col,
        F.floor(
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total))
                    * F.pow(F.col("_n").cast("double"), F.lit(tau))
                    / denom
                    / F.col("_n").cast("double"),
                ),
                rate_dp,
            )
            * DENOM
        ).cast("long").alias("_thresh"),
    )
    return (
        df.join(
            F.broadcast(rates.withColumnRenamed(domain_col, "_dom")),
            F.col(domain_col).eqNullSafe(F.col("_dom")),
        )
        .drop("_dom")
        .filter(_bucket(id_col) < F.col("_thresh"))
        .drop("_thresh")
    )


def temperature_mixture_sql(
    target_total: int,
    tau: float = 0.5,
    domain_col: str = "source",
    id_expr: str = "doc_id",
    rate_dp: int = 9,
    table: str = "documents",
) -> str:
    """DuckDB query reproducing temperature_mixture_sample over `table`."""
    from uc_historic_data_importer_spark.functions.hashes import md5_i64_sql

    h = md5_i64_sql(f"CAST({id_expr} AS VARCHAR)")
    return f"""
      WITH counts AS (
        SELECT {domain_col}, count(*) AS n FROM {table} GROUP BY {domain_col}
      ),
      rates AS (
        SELECT {domain_col},
               CAST(floor(round(least(1.0,
                 {float(target_total)} * pow(n::DOUBLE, {tau})
                 / (sum(pow(n::DOUBLE, {tau})) OVER ())
                 / n::DOUBLE), {rate_dp}) * {DENOM}) AS BIGINT) AS thresh
        FROM counts
      )
      SELECT t.* FROM {table} t
      JOIN rates r ON t.{domain_col} IS NOT DISTINCT FROM r.{domain_col}
      WHERE ({h} % {DENOM}) < r.thresh
    """


def kfold_assign(
    df: DataFrame,
    n_folds: int = 5,
    id_col: str = "doc_id",
    stratum_col: str | None = "source",
    out_col: str = "fold",
) -> DataFrame:
    """Stratified k-fold cross-validation assignment: within each
    stratum, rows are ranked by id hash (deterministic shuffle) and
    dealt round-robin into folds — every stratum contributes to every
    fold within +-1 row (exact balance, unlike independent hashing's
    binomial wobble). One shuffle partitioned by stratum; the fold of a
    row depends on the stratum's membership (by construction — balance
    requires it), so use split_assign when growth-stability matters
    more than balance.

    ``stratum_col=None`` ranks the WHOLE input through one reducer (a
    global row_number with no rank-limit to push down) — fine for
    modest frames, a single-task sort at corpus scale. For unstratified
    folds on a big corpus pass a synthetic stratum (e.g. a
    hash(id) % 1024 column): per-shard round-robin keeps fold sizes
    balanced within +-n_shards while the window parallelizes."""
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    _check_reserved(df, {out_col}, "kfold_assign")
    part = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*part).orderBy(
        md5_i64(F.col(id_col).cast("string")), F.col(id_col)
    )
    return df.withColumn(
        out_col,
        ((F.row_number().over(w) - 1) % n_folds).cast("int"),
    )

"""Gap-based sessionization over an event stream.

Classic training-/clickstream-pipeline operator the reference lacks
(engine extension, same class as the as-of join): events of one key are
grouped into sessions whenever the gap to the previous event exceeds
`gap_ms`.

Plan shape: ONE shuffle on the key; the lag flag and the running sum
share the same (partition, order) spec so Catalyst plans a single
exchange + sort with two Window nodes on top — no second shuffle. At
100 TB this is the per-user timeline partitioning; per-key state is a
single row (previous timestamp), so skewed users cost sort time, not
memory.

Timestamps are compared as epoch millis (`unix_millis`) so results are
session-timezone-proof (matches the catalog convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_MS = 30 * 60 * 1000  # the classic 30-minute web-session gap


def _check_reserved(df: DataFrame, reserved: set[str], op: str) -> None:
    """skew.py-style reserved-name guard (r9 review class): withColumn
    would SILENTLY OVERWRITE an input column named like an internal
    temp or output column — sessionize(df_with_a_'session_idx'_column)
    would replace the user's data, funnel_counts would fold a user '_ts'
    into its own step logic. Raise with a rename hint instead."""
    taken = reserved & set(df.columns)
    if taken:
        raise ValueError(
            f"input columns {sorted(taken)} collide with {op}'s internal "
            "temp names; rename them first"
        )


def sessionize(
    events: DataFrame,
    gap_ms: int = DEFAULT_GAP_MS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Append `session_idx` (1-based per key) to each event.

    A session starts at the first event of a key and whenever
    ts - prev_ts > gap_ms. Ordering ties break on `order_col` so the
    assignment is deterministic.

    NULL-timestamp events are EXCLUDED (dropped from the output): a
    gap has no meaning against an unknown time. Left in, NULLs sort
    first and the `prev IS NULL` first-event test fires for every row
    adjacent to one — each NULL fragments into its own singleton
    session and the first real event always opens a fresh session
    regardless of gap, silently inflating session counts on dirty
    data. Route NULL-ts events through a timestamp-repair pass (or
    constraint_audit them) if they must not be dropped silently."""
    if gap_ms < 0:
        # pre-guard (r13 review): ts - prev > negative is true for every
        # consecutive pair, so EVERY event silently opened its own
        # session (probed) — counts inflated with no error. gap_ms = 0
        # stays legal: "split on any strictly positive gap".
        raise ValueError(f"gap_ms must be >= 0 (got {gap_ms})")
    _check_reserved(events, {"session_idx"}, "sessionize")
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    ts_ms = F.unix_millis(F.col(ts_col))
    prev = F.lag(ts_ms).over(w)
    new_flag = F.when(
        prev.isNull() | ((ts_ms - prev) > F.lit(gap_ms)), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.filter(F.col(ts_col).isNotNull()).withColumn(
        "session_idx", F.sum(new_flag).over(running).cast("int")
    )


def session_stats(
    events: DataFrame,
    gap_ms: int = DEFAULT_GAP_MS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    round_dp: int = 6,
) -> DataFrame:
    """Per-session rollup: bounds, event count, value total.

    The groupBy reuses the sessionize shuffle's (key, session) grouping;
    AQE coalesces the tiny post-window aggregation. `total_value` is
    rounded after the sum (float add order is engine-dependent)."""
    sess = sessionize(events, gap_ms, key_col, ts_col, order_col)
    ts_ms = F.unix_millis(F.col(ts_col))
    return sess.groupBy(key_col, "session_idx").agg(
        F.min(ts_ms).alias("session_start_ms"),
        F.max(ts_ms).alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), round_dp).alias("total_value"),
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: users whose FIRST qualifying occurrence
    of each step strictly follows the previous step's.

    t_1 = min ts of step 1; t_i = min ts of step i with ts > t_{i-1}
    (the first step-i event after the funnel got there — NOT
    min(step_i) > t_{i-1}, which would miss users whose early step-i
    events precede step 1). Returns one row: n_<step> = users reaching
    each step.

    Plan shape: partitionBy-only windows need a hash exchange but NO
    sort, and all i levels share the one exchange on the key; the final
    count is a scalar agg. Per-key state is i timestamps — skew-proof.

    ``steps`` must be non-empty and name each step once: a repeated
    name would alias two output columns identically (the later count
    unreadable through row[name]); model a revisit funnel with distinct
    labels mapped to the same event type upstream."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step names in {steps!r}")
    _check_reserved(
        events,
        {"_ts"} | {f"_t{i}" for i in range(len(steps))},
        "funnel_counts",
    )
    w = Window.partitionBy(key_col)
    df = events.withColumn("_ts", F.unix_millis(F.col(ts_col)))
    prev = None
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col("_ts") > F.col(prev))
        cur = f"_t{i}"
        df = df.withColumn(
            cur, F.min(F.when(cond, F.col("_ts"))).over(w)
        )
        prev = cur
    per_user = df.groupBy(key_col).agg(
        *[F.min(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    return per_user.agg(
        *[
            F.count(F.col(f"_t{i}")).alias(f"n_{s}")
            for i, s in enumerate(steps)
        ]
    )

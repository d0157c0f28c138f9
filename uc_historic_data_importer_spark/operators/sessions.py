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
    assignment is deterministic."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    ts_ms = F.unix_millis(F.col(ts_col))
    prev = F.lag(ts_ms).over(w)
    new_flag = F.when(
        prev.isNull() | ((ts_ms - prev) > F.lit(gap_ms)), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
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

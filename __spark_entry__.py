"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: run the full HDI pipeline (normalize -> key ->
                version -> latest-per-key) over dump-record JSON built
                from the sf0.001 events table.
queries()     — one entry per implemented operator (SURVEY.md §2);
                callables (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events -> dump-record
    JSONL -> full normalization pipeline -> latest-version-per-key ->
    per-type counts. Exercises T1-T7/T10, K1-K3, W4 and the latest
    operator end to end."""
    from pyspark.sql import functions as F

    from uc_historic_data_importer_spark.shipping import ensure_shipped
    from uc_historic_data_importer_spark.operators.keying import flatten_normalized
    from uc_historic_data_importer_spark.operators.latest import latest_per_key_window
    from uc_historic_data_importer_spark.operators.naming import with_table_names
    from uc_historic_data_importer_spark.operators.transforms import normalize_records
    from uc_historic_data_importer_spark.plans.catalog import t

    ensure_shipped(spark)
    ev = t(spark, "/root/testdata/sf0.001", "events")
    # each event becomes one Mongo-dump line; ~20% get the $oid id shape,
    # deletes come from the 'error' type
    raw = ev.select(
        F.lit("events-db").alias("db"),
        F.col("event_type").alias("collection"),
        F.lit(1).alias("file_number"),
        F.col("event_id").cast("int").alias("line_no"),
        F.concat(
            F.lit('{"_id":'),
            F.when(
                F.col("event_id") % 5 == 0,
                F.concat(F.lit('{"$oid":"oid-'), F.col("user_id"), F.lit('"}')),
            ).otherwise(
                F.concat(F.lit('{"userId":"u-'), F.col("user_id"), F.lit('"}'))
            ),
            F.lit(',"value":'),
            F.col("value"),
            F.lit(',"_lastModifiedDateTime":{"$date":"'),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
            F.lit('"}}'),
        ).alias("raw_json"),
    )
    norm = with_table_names(
        flatten_normalized(normalize_records(raw, min_partitions=8))
    )
    latest = latest_per_key_window(
        norm.filter(F.col("valid")), key_cols=("table", "key_hex")
    )
    return latest.groupBy("collection").agg(
        F.count(F.lit(1)).alias("n_current_keys"),
        F.max("version").alias("max_version"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import uc_historic_data_importer_spark.plans.catalog_ext  # noqa: F401 — registers extension queries
    import uc_historic_data_importer_spark.plans.catalog_classic  # noqa: F401
    from uc_historic_data_importer_spark.plans.catalog import QUERIES
    from uc_historic_data_importer_spark.shipping import ensure_shipped

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    import uc_historic_data_importer_spark.plans.catalog_ext  # noqa: F401
    import uc_historic_data_importer_spark.plans.catalog_classic  # noqa: F401
    from uc_historic_data_importer_spark.plans.catalog import QUERIES

    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }

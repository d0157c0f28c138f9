#!/usr/bin/env python
"""Throughput of the ONE Python stage in the HDI pipeline: the
normalize pandas UDF (operators/transforms.py::_normalize_udf — the
dynamic-JSON rewrite SURVEY §7.3 declares unavoidable).

Times normalize_records + flatten over dump-record JSON built from the
events table at $SPARK_GRAFT_SF_DIR (default sf0.1) under both JSON
codecs and prints one line of records/s per codec, so the stage's cost
is tracked round-over-round. Each variant runs in its OWN subprocess:
the codec choice is an import-time env gate (SPARK_HDI_DISABLE_ORJSON)
because Spark's Python workers re-import the module and would ignore a
driver-side switch.

Usage: python tools/bench_normalize.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def child() -> None:
    from pyspark.sql import functions as F

    from uc_historic_data_importer_spark.session import get_spark
    from uc_historic_data_importer_spark.operators import transforms
    from uc_historic_data_importer_spark.operators.keying import flatten_normalized

    spark = get_spark(
        app_name="normalize-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    from uc_historic_data_importer_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    raw = ev.select(
        F.lit("events-db").alias("db"),
        F.col("event_type").alias("collection"),
        F.lit(1).alias("file_number"),
        F.col("event_id").cast("int").alias("line_no"),
        F.concat(
            F.lit('{"_id":{"userId":"u-'),
            F.col("user_id"),
            F.lit("-"),
            F.col("event_id") % 1000,
            F.lit('"},"value":'),
            F.col("value"),
            F.lit(',"_lastModifiedDateTime":{"$date":"'),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
            F.lit('"}}'),
        ).alias("raw_json"),
    )
    n = raw.count()

    def run() -> float:
        t0 = time.time()
        flatten_normalized(
            transforms.normalize_records(raw, min_partitions=int(CPUS))
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run()  # warm the worker pool / codegen
    best = min(run() for _ in range(2))
    print(
        json.dumps(
            {
                "codec": "stdlib" if transforms.orjson is None else "orjson",
                "rows": n,
                "sec": round(best, 2),
                "records_per_s": int(n / best),
            }
        )
    )


def main() -> None:
    results = []
    for disable in ("", "1"):
        env = dict(os.environ)
        if disable:
            env["SPARK_HDI_DISABLE_ORJSON"] = disable
        else:
            env.pop("SPARK_HDI_DISABLE_ORJSON", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    print(json.dumps({"metric": "normalize_udf_throughput", "variants": results}))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()

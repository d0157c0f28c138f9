#!/usr/bin/env python
"""sf1 measurement for segment_clean_docs membership dispatch (r6
verdict item 7): codegen'd 5000-literal array_contains vs a
precompiled-frozenset pandas-UDF pass. Prints per-variant min-of-N
seconds plus a parity check (results must be identical).

Usage: python tools/bench_segment_clean.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hdi_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from uc_historic_data_importer_spark.shipping import ensure_shipped
    from uc_historic_data_importer_spark.operators import text

    ensure_shipped(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bp = [
        r["segment"]
        for r in text.boilerplate_segments(
            docs, k=10, min_docs=3, top_n=5000
        ).collect()
    ]
    print(f"boilerplate list: {len(bp)} segments; docs: {docs.count()}")

    def run(mode: str) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = text.segment_clean_docs(docs, bp, k=10, membership=mode)
            row = out.agg(
                F.sum("n_removed").alias("r"),
                F.sum(F.length("cleaned_text")).alias("l"),
            ).collect()[0]
            best = min(best, time.time() - t0)
            sums = (row["r"], row["l"])
        print(f"{mode:8s}: min-of-{reps} {best:7.2f}s  sums={sums}")
        return sums

    a = run("literal")
    b = run("set_udf")
    print("parity:", "OK" if a == b else f"MISMATCH {a} vs {b}")


if __name__ == "__main__":
    main()

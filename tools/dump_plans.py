"""Dump `.explain("formatted")` for named catalog queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt — the r14 optimization round's
evidence artifacts (plans/r14/<query>_{before,after}.txt)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from uc_historic_data_importer_spark.session import get_spark
    import uc_historic_data_importer_spark.plans.catalog_ext  # noqa: F401
    import uc_historic_data_importer_spark.plans.catalog_classic  # noqa: F401
    from uc_historic_data_importer_spark.plans.catalog import QUERIES

    spark = get_spark(
        app_name="hdi-dump-plans", master="local[4]", shuffle_partitions=4
    )
    # size-dispatched operators (matmul seams) plan differently at bench
    # scale — override to capture the dispatch branch's plan
    sf = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    for name in names:
        df = QUERIES[name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Real-HBase interop (gated): run the bulk-load artifacts through
actual HBase code when an `hbase` binary is on PATH.

The pure-Python HFile writer is format-complete for the reference's
table spec (GZ + multi-level index + ROW bloom) and defended by an
independent parser, hypothesis round-trips, and byte-flip fuzzing — but
none of that is HBase itself. This test closes that gap wherever a JVM
+ HBase install exists: HFilePrettyPrinter (the real reader: trailer ->
load-on-open -> index walk -> block decode) must open every artifact
and stream out exactly the cells we wrote. In this sandbox there is no
jar route (verified each round), so the test reports SKIPPED, not
absent. The full cluster drive (create table -> completebulkload ->
scan-all-versions diff) is tools/hbase_interop/run.sh.
"""

import re
import shutil
import subprocess

import pytest


@pytest.mark.skipif(
    shutil.which("hbase") is None,
    reason="no `hbase` binary on PATH (sandbox has no JVM/HBase route); "
    "run tools/hbase_interop/run.sh where docker exists for the full "
    "bulk-load round-trip",
)
def test_hfile_artifacts_open_under_real_hbase(spark, tmp_path):
    from pyspark.sql import functions as F

    from uc_historic_data_importer_spark import sinks
    from uc_historic_data_importer_spark.functions.keys import row_key_col

    kv = spark.range(50).select(
        F.lit("t1").alias("table"),
        row_key_col(
            F.concat(F.lit('{"someId":"G-'), F.col("id"), F.lit('"}'))
        ).alias("key"),
        F.lit(1000).alias("version"),
        F.concat(F.lit('{"v":'), F.col("id"), F.lit("}")).alias("envelope"),
    ).withColumn("key_hex", F.lower(F.hex(F.col("key"))))
    layout = sinks.hbase_bulkload_layout(kv, n_regions=2)
    paths = sinks.write_hfiles(layout, str(tmp_path / "bulk"))  # GZ + bloom
    assert paths
    total = 0
    for p in paths:
        # -p prints every KeyValue ("K: ... V: ..."), which exercises the
        # whole real read path: trailer, load-on-open, data index, GZ
        # block decode, cell iteration
        proc = subprocess.run(
            ["hbase", "hfile", "-p", "-f", p],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        total += len(re.findall(r"^K: ", proc.stdout, flags=re.M))
    assert total == 50  # every cell we wrote came back out of HBase code

"""Ship the package to Spark executors at runtime.

The driver contract hands us an already-built SparkSession whose Python
workers may not have this repo on PYTHONPATH. Any query that uses a UDF
defined in this package needs the module importable on the workers;
``addPyFile`` with a zip of the package does that without restarting the
session (cloudpickle serializes module-level functions by reference).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), "uc_historic_data_importer_spark_pkg.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(key)

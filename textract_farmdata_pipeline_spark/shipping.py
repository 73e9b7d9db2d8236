"""Ship this package to Spark Python workers.

The assembly fold runs inside ``applyInPandas``; cloudpickle serializes
its helper functions by module reference, so executors must be able to
import this package regardless of the driver's cwd/PYTHONPATH.  On a
real cluster this is one ``--py-files`` zip; here we build that zip
lazily and register it on the running session via ``addPyFile``.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_shipped: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped:
        return
    zip_path = os.path.join(spark.sparkContext._temp_dir, f"{_PKG_NAME}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _shipped.add(app_id)

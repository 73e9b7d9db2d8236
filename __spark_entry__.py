"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``textract_farmdata_pipeline_spark``; this file
only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full census pipeline (filters → column split
    → banded numbering → stateful record assembly with continuation
    merges → CSV-contract projection) on the sf0.001 fixture."""
    from textract_farmdata_pipeline_spark.fixtures import load_ocr_lines
    from textract_farmdata_pipeline_spark.plans import run_pipeline

    blocks = load_ocr_lines(spark, "/root/testdata/sf0.001")
    return run_pipeline(blocks, add_notes=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    north-star analytics surface)."""
    from textract_farmdata_pipeline_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; non-expressible
    ops (continuation-merge fold, MinHash/SimHash/LSH) are omitted on
    purpose — the driver records rows-only checks for those."""
    from textract_farmdata_pipeline_spark.registry import ORACLES

    return dict(ORACLES)

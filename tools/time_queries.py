#!/usr/bin/env python
"""Best-of-N noop-sink timing for a comma-separated query list in one
fresh session (bench methodology, no calibration scan): the isolated
before/after instrument for per-query optimization evidence.

Usage: python tools/time_queries.py q1,q2,... [--runs 3] [--sf DIR]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from textract_farmdata_pipeline_spark.registry import QUERIES
    from textract_farmdata_pipeline_spark.session import get_spark

    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["census_records_full"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args.queries.split(","):
        fn = QUERIES[name]
        gc.collect()
        spark._jvm.System.gc()
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: best={min(ts)} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

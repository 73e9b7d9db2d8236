#!/usr/bin/env python
"""Per-phase wall-clock decomposition of a streaming replay query.

Monkeypatches timers around the shared replay harness pieces —
``_stage_batch_files``, ``ParquetMergeTable.merge/create/read``, and
the whole query — so optimization work on the harness can be
attributed phase by phase, before and after a change.  Read-only with
respect to query code: the patches only measure.

Usage: python tools/replay_profile.py <query_name> [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PHASES: dict[str, list[float]] = collections.defaultdict(list)


def _timed(label: str, fn):
    def wrapper(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        PHASES[label].append(time.perf_counter() - t0)
        return out

    return wrapper


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from textract_farmdata_pipeline_spark.operators import merge as merge_mod
    from textract_farmdata_pipeline_spark.streaming import ingest as ingest_mod
    from textract_farmdata_pipeline_spark.registry import QUERIES
    from textract_farmdata_pipeline_spark.session import get_spark

    ingest_mod._stage_batch_files = _timed(
        "stage_batch_files", ingest_mod._stage_batch_files
    )
    merge_mod.ParquetMergeTable.merge = _timed(
        "table.merge", merge_mod.ParquetMergeTable.merge
    )
    merge_mod.ParquetMergeTable.create = _timed(
        "table.create", merge_mod.ParquetMergeTable.create
    )

    spark = get_spark("replay-profile")
    spark.sparkContext.setLogLevel("ERROR")

    fn = QUERIES[args.query]
    for run in range(args.runs):
        for v in PHASES.values():
            v.clear()
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        parts = {
            k: round(sum(v), 2) for k, v in sorted(PHASES.items())
        }
        counted = sum(sum(v) for v in PHASES.values())
        print(
            f"run {run}: total {dt:.2f}s  phases {parts}  "
            f"(calls: { {k: len(v) for k, v in sorted(PHASES.items())} })  "
            f"residual {dt - counted:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

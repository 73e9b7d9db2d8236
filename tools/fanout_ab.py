#!/usr/bin/env python
"""A/B the thin-scan fan-out variants in ONE session (r13 verdict #1).

Interleaves variants per query (each query's three variants run
back-to-back) so slow host drift hits all variants equally, and times
best-of-N through the noop sink.  Variants are monkeypatched over
``registry._fan_out_thin_scan``:

* ``off``   — identity (no fan-out; the r12 behavior)
* ``rdd``   — the r13 shipped version (df.rdd.getNumPartitions() probe,
              width = defaultParallelism)
* ``est``   — file-size split estimate (no DataFrame→RDD conversion),
              width = defaultParallelism
* ``bytes`` — file-size estimate, width = clamp(bytes/TARGET, 2, cores)

Usage: python tools/fanout_ab.py [--runs 3] [--target-kb 64] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHEAP = (
    "doc_token_stats",
    "doc_fingerprint",
    "doc_quality_score",
    "doc_hash_sample",
    "doc_clean_scrub",
    "dedup_exact_hash",
    "events_hourly",
    "events_sessionize",
    "corpus_top_bigrams",
    "doc_lang_guess",
)
HEAVY = (
    "dedup_containment_prefix",
    "dedup_containment_map",
    "embedding_near_dup_pairs_lsh",
    "customer_supplier_pagerank",
    "dedup_jaccard_prefix",
    "embedding_ann_eval",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--target-kb", type=int, default=64)
    ap.add_argument("--json", default="/tmp/fanout_ab.json")
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from textract_farmdata_pipeline_spark import registry
    from textract_farmdata_pipeline_spark.session import get_spark

    spark = get_spark("fanout_ab")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    min_bytes = registry._FAN_OUT_MIN_BYTES
    open_cost = 4 * 1024 * 1024
    target = args.target_kb * 1024

    def _sizes(path: str) -> tuple[int, int]:
        if os.path.isfile(path):
            return os.path.getsize(path), 1
        total = n = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
                    n += 1
        return total, n

    def _est_splits(tbytes: int, nfiles: int) -> int:
        padded = tbytes + nfiles * open_cost
        max_split = min(128 * 1024 * 1024, max(open_cost, padded // max(cores, 1)))
        return max(1, math.ceil(padded / max_split))

    def v_off(df, path):
        return df

    def v_rdd(df, path):
        try:
            if os.path.getsize(path) < min_bytes:
                return df
        except OSError:
            return df
        if df.rdd.getNumPartitions() >= cores:
            return df
        return df.repartition(cores)

    def v_est(df, path):
        try:
            tbytes, nfiles = _sizes(path)
        except OSError:
            return df
        if tbytes < min_bytes or not nfiles:
            return df
        if _est_splits(tbytes, nfiles) >= cores:
            return df
        return df.repartition(cores)

    def v_bytes(df, path):
        try:
            tbytes, nfiles = _sizes(path)
        except OSError:
            return df
        if tbytes < min_bytes or not nfiles:
            return df
        width = min(cores, max(2, tbytes // target))
        if _est_splits(tbytes, nfiles) >= width:
            return df
        return df.repartition(width)

    variants = {"off": v_off, "rdd": v_rdd, "est": v_est, "bytes": v_bytes}
    if args.queries:
        names = tuple(args.queries.split(","))
    else:
        names = CHEAP + HEAVY

    # warm-up (codegen + python workers) at the current variant
    registry._fan_out_thin_scan = v_rdd
    registry.QUERIES["census_records_full"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    import gc

    results: dict[str, dict[str, list[float]]] = {n: {} for n in names}
    for name in names:
        fn = registry.QUERIES[name]
        for vname, patch in variants.items():
            registry._fan_out_thin_scan = patch
            gc.collect()
            spark._jvm.System.gc()
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
            results[name][vname] = ts
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
        row = {v: min(t) for v, t in results[name].items()}
        print(f"{name}: " + "  ".join(f"{v}={t:.2f}" for v, t in row.items()),
              flush=True)

    print("\nbest-of per tier:")
    for tier, tnames in (("cheap", CHEAP), ("heavy", HEAVY)):
        tnames = [n for n in tnames if n in results and results[n]]
        for v in variants:
            tot = sum(min(results[n][v]) for n in tnames)
            print(f"  {tier} {v}: {tot:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()

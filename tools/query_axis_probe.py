"""Query-count-axis scaling probe for the distributed ADC LUT build.

The corpus-axis probes in ``scale_probe.py`` replicate the DATA 10×;
this probe replicates the QUERY BATCH 10× (distinct ids, same corpus)
and times the IVF-gated ADC scan end to end — the evidence that the
query axis now partitions like the corpus axis (LUTs built in a
``mapInPandas`` stage over the queries DataFrame) instead of
serializing through a driver ``collect()`` loop.

Index build (k-means + PQ train + encode) happens ONCE outside the
timed region and the code table is cached: what is timed is exactly
the per-query work — LUT construction, the broadcast cell-gate join,
ADC scoring, and the top-k window.

Writes results incrementally to ``--json`` (one save per measurement,
so a crashed run keeps its partials) and prints a summary row for
docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--base-queries", type=int, default=100)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--json", default="/tmp/query_axis_probe.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from textract_farmdata_pipeline_spark.operators.similarity import (
        kmeans_train,
        pq_encode_ivf,
        pq_ivf_topk,
        pq_train,
    )
    from textract_farmdata_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf": args.sf, "base_queries": args.base_queries,
                     "factor": args.factor}

    def save() -> None:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=2)

    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    cents, _ = kmeans_train(emb, k=16, max_iter=4)
    books = pq_train(emb, m=8, ks=16, max_iter=4, persist=False)
    codes = pq_encode_ivf(emb, books, cents)
    codes.cache().count()  # index build excluded from the timed region

    base_q = emb.filter(F.col("vec_id") < args.base_queries)
    # distinct ids per replica so the per-query windows stay per-query
    big_q = base_q
    for i in range(1, args.factor):
        big_q = big_q.unionByName(
            base_q.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )

    for label, q in (("t_base_sec", base_q), ("t_x_sec", big_q)):
        t0 = time.monotonic()
        n = pq_ivf_topk(codes, books, cents, q, k=5, n_probe=4).count()
        results[label] = round(time.monotonic() - t0, 3)
        results[label.replace("t_", "rows_")] = n
        save()

    results["ratio"] = round(results["t_x_sec"] / results["t_base_sec"], 2)
    save()
    print(json.dumps(results))
    print(
        f"| pq_ivf_topk query-axis ×{args.factor} | "
        f"{results['t_base_sec']} | {results['t_x_sec']} | "
        f"{results['ratio']} | "
        f"{'OK' if results['ratio'] < 15 else 'SLOW'} |"
    )
    spark.stop()


if __name__ == "__main__":
    main()

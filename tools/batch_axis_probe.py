#!/usr/bin/env python
"""Batch-COUNT-axis probe for the streaming-ingest family.

The corpus-axis probes (scale_probe.py) replicate data; this one holds
the corpus FIXED and grows the number of micro-batches it arrives in —
the axis a long-lived production stream actually grows along (the bench
replays 4 batches; real ingest runs thousands).  For each K the same
sf0.1 documents table is delivered in K deterministic micro-batches and
the whole replay is timed; the quantity under test is the MEAN COST PER
BATCH as K grows:

* ``dedup_ingest_stream`` — matching state (admitted shingle
  signatures) grows with the admitted corpus, but each batch only
  JOINS against it; per-batch cost should stay ~flat (each batch is
  1/K of the corpus, so smaller batches offset the growing state scan).
* ``bloom_ingest_stream`` — state is a constant m-bits filter plus the
  per-batch covered-marker probe; per-batch cost must be flat BY
  CONSTRUCTION, and this probe is the regression guard for the r11 fix
  that replaced the whole-covered-table collect (O(total batches) per
  batch → O(n²) over the stream) with a batch-id-filtered existence
  probe.

Fixed per-batch trigger overhead (micro-batch planning, commit
protocol, state-table open) dominates at small batch sizes, so
total time GROWS with K even for perfectly flat designs; the failure
signature this probe exists to catch is per-batch cost growing with
BATCH ORDINAL — which shows up as mean-per-batch at K=32 far above
K=4 (each batch paying for all its predecessors), not as mere
fixed-overhead multiplication.

Usage: python tools/batch_axis_probe.py [--sf DIR] [--ks 4,32]
Prints one JSON line per (stream, K) and a summary; paste the table
into docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf", default="/root/testdata/sf0.1")
    parser.add_argument("--ks", default="4,32")
    args = parser.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    from textract_farmdata_pipeline_spark.session import get_spark
    from textract_farmdata_pipeline_spark.streaming.ingest import (
        replay_bloom_batches,
        replay_ingest_batches,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf, "documents.parquet")).select(
        "doc_id", "text"
    )
    docs = docs.localCheckpoint()  # fixed input; exclude scan from timing

    runners = {
        "dedup_ingest_stream": lambda wd, k: replay_ingest_batches(
            docs, wd, k_batches=k
        ).count(),
        "bloom_ingest_stream": lambda wd, k: replay_bloom_batches(
            docs, wd, k_batches=k
        ).count(),
    }

    results: dict[str, dict[int, dict[str, float]]] = {}
    for name, run in runners.items():
        results[name] = {}
        for k in ks:
            wd = tempfile.mkdtemp(prefix=f"batch_axis_{name}_{k}_")
            t0 = time.monotonic()
            rows = run(wd, k)
            dt = time.monotonic() - t0
            shutil.rmtree(wd, ignore_errors=True)
            rec = {
                "k_batches": k,
                "rows": rows,
                "total_sec": round(dt, 2),
                "per_batch_sec": round(dt / k, 3),
                # unrounded value kept for the ratio — a fast run's
                # per_batch_sec can round to 0.0 and poison the divide
                "_per_batch_raw": dt / k,
            }
            results[name][k] = rec
            print(
                json.dumps(
                    {
                        "stream": name,
                        **{kk: v for kk, v in rec.items() if kk != "_per_batch_raw"},
                    }
                ),
                flush=True,
            )

    summary = {}
    for name, by_k in results.items():
        lo, hi = min(ks), max(ks)
        summary[name] = {
            "per_batch_ratio": round(
                by_k[hi]["_per_batch_raw"] / by_k[lo]["_per_batch_raw"], 2
            ),
            "detail": {
                k: {kk: v for kk, v in rec.items() if kk != "_per_batch_raw"}
                for k, rec in by_k.items()
            },
        }
    print(json.dumps({"ks": ks, "summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""End-to-end usage example: blocks in, per-document census CSVs out.

Three ways to obtain line rows — pick one:

1. pre-extracted block JSON on disk (offline, what this script runs);
2. the distributed OCR connector over an S3 listing (needs boto3);
3. the Spark-4 DataSource: ``spark.read.format("textract_ocr")``.

Run: ``python examples/run_census_pipeline.py [blocks_dir] [out_dir]``
(with no args it synthesizes a demo blocks dir under /tmp).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from textract_farmdata_pipeline_spark.functions.register import register_sql_functions
from textract_farmdata_pipeline_spark.plans import run_pipeline
from textract_farmdata_pipeline_spark.session import get_spark
from textract_farmdata_pipeline_spark.sources import (
    flatten_blocks,
    read_blocks_json,
    write_census_csv,
)

DEMO_BLOCKS = [
    {"BlockType": "LINE", "Text": "Wayne County Agricultural Census 1860", "Page": 1,
     "Geometry": {"BoundingBox": {"Left": 0.3, "Top": 0.01, "Width": 0.4, "Height": 0.01}}},
    {"BlockType": "LINE", "Text": "John Smith (Johnny) Jr., 120, 40, 1500, 100, 300", "Page": 1,
     "Geometry": {"BoundingBox": {"Left": 0.1, "Top": 0.10, "Width": 0.3, "Height": 0.012}}},
    {"BlockType": "LINE", "Text": "Robt. Vance, -, 80, -, 60, -", "Page": 1,
     "Geometry": {"BoundingBox": {"Left": 0.1, "Top": 0.17, "Width": 0.3, "Height": 0.012}}},
    {"BlockType": "LINE", "Text": "450, -, 1200", "Page": 1,
     "Geometry": {"BoundingBox": {"Left": 0.1, "Top": 0.19, "Width": 0.3, "Height": 0.012}}},
    {"BlockType": "LINE", "Text": "Mary Ann McCoy, 14335", "Page": 1,
     "Geometry": {"BoundingBox": {"Left": 0.6, "Top": 0.10, "Width": 0.3, "Height": 0.012}}},
]


def main() -> None:
    blocks_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/census_demo/blocks"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/census_demo/csv"

    if not os.path.isdir(blocks_dir) or not os.listdir(blocks_dir):
        os.makedirs(blocks_dir, exist_ok=True)
        with open(os.path.join(blocks_dir, "wayne-p41.json"), "w") as fh:
            for b in DEMO_BLOCKS:
                fh.write(json.dumps({"doc_id": "wayne-p41", **b}) + "\n")

    spark = get_spark("census-example")
    spark.sparkContext.setLogLevel("WARN")
    try:
        lines = flatten_blocks(read_blocks_json(spark, blocks_dir))
        frame = run_pipeline(lines, add_notes=True, keep_doc_id=True)
        frame.show(truncate=False)
        write_census_csv(frame, out_dir, single_file_per_doc=True)
        print(f"wrote per-document CSVs under {out_dir}")

        # the same classifiers compose in plain SQL:
        register_sql_functions(spark)
        lines.createOrReplaceTempView("lines")
        spark.sql(
            "SELECT text, starts_with_name(text) AS is_name, "
            "is_continuation_line(text) AS is_cont FROM lines"
        ).show(truncate=60)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

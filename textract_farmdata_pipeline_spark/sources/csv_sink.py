"""CSV sink (reference S9/S10): census output frame → per-document CSVs.

The reference writes one CSV object per input file, key derived from
the input basename (/root/reference/lambda_function.py:769-774,
811-813).  Spark equivalent: ``partitionBy(doc_id)`` so each document's
rows land in their own directory — a distributed write with the same
one-output-per-input layout, idempotent under ``overwrite`` exactly as
a replayed S3 event overwrites the same key in the reference.

Dash rendering ('' / NULL → '-', lambda_function.py:751-753) is part of
the projection in operators.output; this sink only handles placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_census_csv(
    frame: DataFrame,
    path: str,
    per_document: bool = True,
    single_file_per_doc: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write the 12/13-column census frame as UTF-8 CSV with header.

    ``per_document`` partitions output by ``doc_id`` (S10 path
    derivation); ``single_file_per_doc`` additionally repartitions so
    each document is one file, matching the reference's one-object
    output — use only when per-document row counts are file-sized
    (census pages are; at 100 TB keep the default and let each doc
    hold multiple parts).
    """
    writer = frame.write.option("header", True).mode(mode)
    if per_document and "doc_id" in frame.columns:
        if single_file_per_doc:
            frame = frame.repartition("doc_id")
            writer = frame.write.option("header", True).mode(mode)
        writer.partitionBy("doc_id").csv(path)
    else:
        writer.csv(path)

"""Streaming census pipeline (reference §2.7 semantics).

The reference is event-driven: each S3 ``ObjectCreated`` event triggers
one Lambda that processes exactly one document and writes one CSV
(/root/reference/lambda_function.py:779-817).  There is no cross-file
state, so the Spark mapping is a file-source stream +
``foreachBatch`` running the *batch* pipeline per micro-batch:

* file arrival ≙ the S3 event (new JSON dumps under the input dir);
* ``availableNow`` trigger ≙ backfill of queued events;
* checkpointing upgrades the reference's effectively-idempotent
  overwrite (same output key per input, lambda_function.py:811-813) to
  exactly-once sink writes;
* a failed batch is retried by the engine rather than skipped — a
  strictly stronger guarantee than the reference's log-and-continue
  (S11); per-file poisoning is still isolated because the pipeline has
  no cross-document state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..plans.pipeline import run_pipeline
from ..sources.blocks import BLOCK_SCHEMA, flatten_blocks
from ..sources.csv_sink import write_census_csv


def stream_census_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    add_notes: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_path`` for Textract block JSON; write census CSVs.

    Returns the started query; callers own ``awaitTermination``.
    """
    stream = spark.readStream.schema(BLOCK_SCHEMA).json(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # flatten here: monotonically_increasing_id (the seq tie-break)
        # is legal only in the batch context foreachBatch provides
        lines = flatten_blocks(batch_df)
        out = run_pipeline(lines, add_notes=add_notes, keep_doc_id=True)
        write_census_csv(out, output_path, per_document=True, mode="append")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

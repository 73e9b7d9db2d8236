"""S1: S3 event-record unpack → (bucket, key) OCR listing.

Reference parity: the Lambda handler walks ``event["Records"]``, takes
``rec.s3.bucket.name`` (defaulting to the configured bucket) and
``rec.s3.object.key``, ``urllib.parse.unquote_plus``-decodes the key
(S3 event notifications URL-encode object keys, with ``+`` for space),
and skips keys outside ``RAW_PREFIX`` (lambda_function.py:785-793).

Spark-first twin: ``from_json`` over the event payload, one executor-side
explode of the Records array, and ``F.url_decode`` — Spark's
application/x-www-form-urlencoded decoder, i.e. exactly
``unquote_plus`` semantics — all JVM-side, no Python in the path.  The
output shape is the (bucket, key) listing :func:`..sources.textract
.ocr_listing` consumes, so replayed event batches drive the same OCR
pipeline as directory listings do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Only the fields the reference reads; from_json ignores the rest of the
# (large) S3 event notification payload, and Spark prunes the parse to
# these leaves.
S3_EVENT_SCHEMA = T.StructType(
    [
        T.StructField(
            "Records",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "s3",
                            T.StructType(
                                [
                                    T.StructField(
                                        "bucket",
                                        T.StructType(
                                            [T.StructField("name", T.StringType())]
                                        ),
                                    ),
                                    T.StructField(
                                        "object",
                                        T.StructType(
                                            [T.StructField("key", T.StringType())]
                                        ),
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def s3_events_source(
    events: DataFrame,
    json_col: str = "event_json",
    raw_prefix: str = "raw/",
    default_bucket: str | None = None,
) -> DataFrame:
    """Unpack S3 event-notification JSON into an OCR (bucket, key) listing.

    ``events`` carries one event payload per row in ``json_col`` (a
    replayed SQS/SNS/S3 notification batch).  Each payload may hold
    multiple Records; rows with no Records contribute nothing (the
    reference returns early on an empty batch).  Keys are
    ``unquote_plus``-decoded and gated on ``raw_prefix`` exactly as the
    reference gates on ``RAW_PREFIX``; empty keys are dropped.
    """
    recs = (
        events.select(
            F.explode(
                F.from_json(F.col(json_col), S3_EVENT_SCHEMA)["Records"]
            ).alias("rec")
        )
        .select(
            F.coalesce(
                F.col("rec.s3.bucket.name"),
                F.lit(default_bucket).cast("string"),
            ).alias("bucket"),
            F.url_decode(F.coalesce(F.col("rec.s3.object.key"), F.lit(""))).alias(
                "key"
            ),
        )
    )
    return recs.filter(
        (F.col("key") != "") & F.col("key").startswith(raw_prefix)
    )

"""Layout operators (reference F1-F4, O1-O5): pure Column expressions.

Maps the reference's imperative per-page loops onto declarative Spark:

* F1 LINE filter + F3 blank filter + F4 header filter
  (/root/reference/lambda_function.py:578-583) — ``filter`` chain, all
  pushdown-friendly.
* O2 two-column split at a fixed x-threshold (…:596-598) — derived key.
* O3 top-to-bottom order (…:600-602) — made explicit via the
  ``(top, seq)`` sort key threaded through downstream operators
  (DataFrames are unordered; ``seq`` breaks exact-``top`` ties
  deterministically).
* line classification (name-start / continuation) — JVM-side regex
  columns so the hot path never leaves whole-stage codegen.

The banded page-line numbering (O5, …:605-652) and the session fold
(A1) live in :mod:`.assembly` — they are per-column sequential logic and
run in one Arrow-batched pass per ``(doc, page, column)`` group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import (
    is_blank_col,
    is_continuation_line_col,
    is_header_text_col,
    starts_with_name_col,
)

# Fixed two-column x-threshold (lambda_function.py:571-572; the adaptive
# histogram variant there is dead code — see analyze_column_threshold below).
DEFAULT_COLUMN_THRESHOLD = 0.5


def prepare_blocks(blocks: DataFrame, threshold: float = DEFAULT_COLUMN_THRESHOLD) -> DataFrame:
    """Blocks → filtered, column-assigned line rows.

    Expects columns ``doc_id, seq, block_type, text, page, left, top``
    (the flattened Textract block shape; see sources.blocks for the
    nested-struct flattener).
    """
    return (
        blocks.filter(F.col("block_type") == "LINE")
        .withColumn("text", F.trim(F.col("text")))
        .filter(~is_blank_col(F.col("text")))
        .filter(~is_header_text_col(F.col("text")))
        .withColumn("page", F.coalesce(F.col("page"), F.lit(1)).cast("long"))
        .withColumn(
            "column_side",
            F.when(F.col("left") < F.lit(threshold), F.lit("L")).otherwise(F.lit("R")),
        )
    )


def classify_lines(lines: DataFrame) -> DataFrame:
    """Add ``is_name`` / ``is_cont`` flags (F6/F7) as codegen'd columns.

    Classification precedence in the fold is continuation → name →
    other (lambda_function.py:474-545); ``is_cont`` already excludes
    name-starts, so the two flags are disjoint.
    """
    return lines.withColumn("is_name", starts_with_name_col(F.col("text"))).withColumn(
        "is_cont", is_continuation_line_col(F.col("text"))
    )


def analyze_column_threshold(lines: DataFrame) -> float:
    """Optional adaptive column threshold (reference dead code,
    lambda_function.py:96-131): 20-bin histogram of x-positions, take the
    sparsest interior bin's center.  Distributed here via groupBy(bin)
    instead of a driver-side sort; degenerate inputs return 0.5.

    Not in the default path — parity with the reference requires the
    fixed 0.5 threshold.
    """
    stats = lines.agg(
        F.min("left").alias("lo"), F.max("left").alias("hi"), F.count("*").alias("n")
    ).first()
    if stats["n"] < 10 or (stats["hi"] - stats["lo"]) < 0.1:
        return DEFAULT_COLUMN_THRESHOLD
    lo, hi = stats["lo"], stats["hi"]
    bin_size = (hi - lo) / 20.0
    hist = dict(
        lines.select(
            F.least(F.lit(19), F.floor((F.col("left") - F.lit(lo)) / F.lit(bin_size)))
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .count()
        .collect()
    )
    # Empty interior bins count as 0 — the earliest minimum wins.
    gap_bin = min(range(5, 15), key=lambda b: (hist.get(b, 0), b))
    return lo + (gap_bin + 0.5) * bin_size

"""End-to-end pipeline composition: blocks → person records → CSV frame.

The reference's entry-point chain (lambda_handler → textract_to_records
→ normalize_to_csv_format, /root/reference/lambda_function.py:779-813)
as one lazy DataFrame plan.  The per-page/per-column Python loops of the
reference disappear into partitioning; the only shuffle is the
``(doc_id, page, column_side)`` exchange feeding the assembly fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.assembly import assemble_records
from ..operators.layout import DEFAULT_COLUMN_THRESHOLD, classify_lines, prepare_blocks
from ..operators.output import to_census_csv


def blocks_to_records(
    blocks: DataFrame, threshold: float = DEFAULT_COLUMN_THRESHOLD
) -> DataFrame:
    """F1→F3→F4→O1→O2→classify→(O3,O5,A1): blocks to assembled records."""
    lines = classify_lines(prepare_blocks(blocks, threshold))
    return assemble_records(lines)


def run_pipeline(
    blocks: DataFrame,
    threshold: float = DEFAULT_COLUMN_THRESHOLD,
    add_notes: bool = True,
    ordered: bool = True,
    keep_doc_id: bool = False,
) -> DataFrame:
    """Full pipeline to the CSV-contract frame, in reading order (O6)."""
    records = blocks_to_records(blocks, threshold)
    if ordered:
        # O6 reading order: pages ascending, left column before right,
        # records top-to-bottom.  The projection below preserves the sort.
        records = records.orderBy("doc_id", "page", "column_side", "record_seq")
    return to_census_csv(records, add_notes=add_notes, keep_doc_id=keep_doc_id)

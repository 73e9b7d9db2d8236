"""A1 — sessionized record assembly (the stateful core).

The reference folds each ``(page, column)`` line stream with one piece
of state, the in-flight record (/root/reference/lambda_function.py:455-565),
after assigning banded page-line numbers to name lines (…:605-652).

Spark mapping: one shuffle on ``(doc_id, page, column_side)`` then a
single Arrow-batched ``applyInPandas`` pass per group that replays, in
``(top, seq)`` order:

* O5 banded page-line numbering — sequential counter over name lines,
  incrementing when consecutive tops differ by more than ``0.01``;
* A1 fold — name line starts a record (P1 parse), continuation lines
  (P3 extract → P4 cursor-merge) and digit-bearing malformed lines merge
  into it, orphans before the first name line are dropped.

The P4 cursor-merge is order-sensitive across lines, which is why this
is a grouped fold rather than window expressions; a page column is a few
hundred lines, so per-group memory is O(100) rows at any total scale —
parallelism comes from the number of (doc, page, column) groups.

Line classification (``is_name``/``is_cont``) is computed JVM-side in
:mod:`.layout` before the shuffle, so the Python island does no regex
work beyond the parsers themselves.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame

from ..functions.parsing import (
    N_SLOTS,
    extract_continuation_values,
    merge_positional,
    parse_name_line,
)

# Band tolerance for page-line numbering (lambda_function.py:618, 643).
PAGE_LINE_BAND = 0.01

RECORDS_SCHEMA = (
    "doc_id long, page long, column_side string, record_seq long, "
    "name string, page_line long, "
    "acres_improved string, acres_unimproved string, cash_value_farm string, "
    "value_implements string, value_livestock string"
)

_VALUE_COLS = (
    "acres_improved",
    "acres_unimproved",
    "cash_value_farm",
    "value_implements",
    "value_livestock",
)


def _fold_column(pdf: pd.DataFrame) -> pd.DataFrame:
    """Fold one (doc, page, column) group of classified lines into records."""
    pdf = pdf.sort_values(["top", "seq"], kind="mergesort")

    # O5: banded page-line numbers over name lines, in top order.
    page_lines: list[int] = []
    current, prev_top = 1, None
    for top, is_name in zip(pdf["top"], pdf["is_name"]):
        if is_name:
            if prev_top is not None and abs(top - prev_top) > PAGE_LINE_BAND:
                current += 1
            page_lines.append(current)
            prev_top = top
        else:
            page_lines.append(1)  # placeholder; only name lines matter

    # A1: the single-record-state fold.
    out_rows: list[tuple] = []
    name = None
    slots: list[str] | None = None
    rec_page_line = 1

    def flush() -> None:
        if name:
            padded = (slots + ["-"] * N_SLOTS)[:N_SLOTS]
            out_rows.append((len(out_rows) + 1, name, rec_page_line, *padded))

    for text, is_name, is_cont, pl in zip(
        pdf["text"], pdf["is_name"], pdf["is_cont"], page_lines
    ):
        text = text.strip()
        if is_cont:
            if slots is not None:
                values = extract_continuation_values(text)
                if values:
                    slots = merge_positional(slots, values)
        elif is_name:
            flush()
            name, slots = parse_name_line(text)
            rec_page_line = pl
        else:
            # Malformed line: merge only if it yields any real value
            # (lambda_function.py:526-545); dropped when no record is open.
            if slots is not None:
                values = extract_continuation_values(text)
                if any(v != "-" for v in values):
                    slots = merge_positional(slots, values)
    flush()

    doc_id = pdf["doc_id"].iloc[0]
    page = pdf["page"].iloc[0]
    side = pdf["column_side"].iloc[0]
    return pd.DataFrame(
        [(doc_id, page, side, seq, nm, pl, *vals) for seq, nm, pl, *vals in out_rows],
        columns=["doc_id", "page", "column_side", "record_seq", "name", "page_line", *_VALUE_COLS],
    )


def assemble_records(lines: DataFrame) -> DataFrame:
    """Classified lines → one row per person record.

    Input columns: ``doc_id, page, column_side, top, seq, text,
    is_name, is_cont`` (see layout.classify_lines).  Output follows
    ``RECORDS_SCHEMA``; reading order is ``(doc_id, page, column_side,
    record_seq)`` — left column before right, top to bottom (O6,
    lambda_function.py:654-666).
    """
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(lines.sparkSession)
    cast = lines.selectExpr(
        "cast(doc_id as long) doc_id",
        "cast(page as long) page",
        "column_side",
        "cast(top as double) top",
        "cast(seq as long) seq",
        "text",
        "is_name",
        "is_cont",
    )
    return cast.groupBy("doc_id", "page", "column_side").applyInPandas(
        _fold_column, schema=RECORDS_SCHEMA
    )


def iter_column_records(
    rows: Iterable[tuple[str, bool, bool, int]],
) -> list[tuple[str, list[str], int]]:
    """Pure-Python fold over (text, is_name, is_cont, page_line) tuples —
    exposed for unit goldens; same state machine as ``_fold_column``."""
    out: list[tuple[str, list[str], int]] = []
    name, slots, pl = None, None, 1
    for text, is_name, is_cont, page_line in rows:
        text = text.strip()
        if is_cont:
            if slots is not None:
                values = extract_continuation_values(text)
                if values:
                    slots = merge_positional(slots, values)
        elif is_name:
            if name:
                out.append((name, (slots + ["-"] * N_SLOTS)[:N_SLOTS], pl))
            name, slots = parse_name_line(text)
            pl = page_line
        else:
            if slots is not None:
                values = extract_continuation_values(text)
                if any(v != "-" for v in values):
                    slots = merge_positional(slots, values)
    if name:
        out.append((name, (slots + ["-"] * N_SLOTS)[:N_SLOTS], pl))
    return out

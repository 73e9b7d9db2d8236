"""A1 — sessionized record assembly (the stateful core).

The reference folds each ``(page, column)`` line stream with one piece
of state, the in-flight record (/root/reference/lambda_function.py:455-565),
after assigning banded page-line numbers to name lines (…:605-652).

Spark mapping: one shuffle on ``(doc_id, page, column_side)`` with an
in-partition sort, then a single Arrow-batched ``mapInPandas`` pass that
streams each partition's rows through a fold state machine (group
boundaries detected on the sorted key — one Python call per *partition*,
not per group, so the per-group pandas overhead of
``groupBy().applyInPandas`` is gone).  The fold replays, in ``(top,
seq)`` order:

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
    "doc_id string, page long, column_side string, record_seq long, "
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


_OUT_COLUMNS = ["doc_id", "page", "column_side", "record_seq", "name", "page_line", *_VALUE_COLS]

# Yield an output batch once this many record rows have accumulated, so
# driver/executor memory stays bounded regardless of partition size.
_EMIT_EVERY = 8192


def _fold_partition(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """Stream one sorted partition of classified lines into records.

    Rows arrive ordered by ``(doc_id, page, column_side, top, seq)``;
    the (doc, page, column) group boundary resets the fold state.  One
    state machine handles O5 banding and the A1 record fold in the same
    pass, carrying state across Arrow batch boundaries.
    """
    buf: list[tuple] = []

    key = None  # current (doc_id, page, column_side)
    name: str | None = None
    slots: list[str] | None = None
    rec_page_line = 1
    group_count = 0  # records emitted for the current group
    pl_counter, prev_top = 1, None  # O5 banding state

    def flush_record() -> None:
        nonlocal group_count
        if name:
            padded = (slots + ["-"] * N_SLOTS)[:N_SLOTS]
            group_count += 1
            buf.append((*key, group_count, name, rec_page_line, *padded))

    for pdf in batches:
        rows = zip(
            pdf["doc_id"].tolist(),
            pdf["page"].tolist(),
            pdf["column_side"].tolist(),
            pdf["top"].tolist(),
            pdf["text"].tolist(),
            pdf["is_name"].tolist(),
            pdf["is_cont"].tolist(),
        )
        for doc_id, page, side, top, text, is_name, is_cont, in rows:
            row_key = (doc_id, page, side)
            if row_key != key:
                flush_record()
                key = row_key
                name, slots = None, None
                group_count = 0
                pl_counter, prev_top = 1, None

            if is_name:
                # O5: banded page-line numbering over name lines.
                if prev_top is not None and abs(top - prev_top) > PAGE_LINE_BAND:
                    pl_counter += 1
                prev_top = top

            text = text.strip()
            if is_cont:
                if slots is not None:
                    values = extract_continuation_values(text)
                    if values:
                        slots = merge_positional(slots, values)
            elif is_name:
                flush_record()
                name, slots = parse_name_line(text)
                rec_page_line = pl_counter
            else:
                # Malformed line: merge only if it yields any real value
                # (lambda_function.py:526-545); dropped when no record
                # is open.
                if slots is not None:
                    values = extract_continuation_values(text)
                    if any(v != "-" for v in values):
                        slots = merge_positional(slots, values)

        if len(buf) >= _EMIT_EVERY:
            yield pd.DataFrame(buf, columns=_OUT_COLUMNS)
            buf = []

    flush_record()
    if buf:
        yield pd.DataFrame(buf, columns=_OUT_COLUMNS)


def assemble_records(lines: DataFrame) -> DataFrame:
    """Classified lines → one row per person record.

    Input columns: ``doc_id, page, column_side, top, seq, text,
    is_name, is_cont`` (see layout.classify_lines).  Output follows
    ``RECORDS_SCHEMA``; reading order is ``(doc_id, page, column_side,
    record_seq)`` — left column before right, top to bottom (O6,
    lambda_function.py:654-666).

    Physical plan: exactly one Exchange (hash on the group key), an
    in-partition sort, and one Arrow-batched Python pass per partition.
    Group state is O(1) per group (one in-flight record), so partitions
    stream at any scale.
    """
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(lines.sparkSession)
    # doc_id is an opaque document identity (reference: the S3 object
    # basename) — kept as string so any source id shape works.
    cast = lines.selectExpr(
        "cast(doc_id as string) doc_id",
        "cast(page as long) page",
        "column_side",
        "cast(top as double) top",
        "cast(seq as long) seq",
        "text",
        "is_name",
        "is_cont",
    )
    ordered = cast.repartition("doc_id", "page", "column_side").sortWithinPartitions(
        "doc_id", "page", "column_side", "top", "seq"
    )
    return ordered.mapInPandas(_fold_partition, schema=RECORDS_SCHEMA)


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

"""A3 — output normalization to the census CSV contract.

One ``select`` projection (reference normalize_to_csv_format,
/root/reference/lambda_function.py:720-764): alternate-name extraction
(P6), surname/given/suffix split (P5), the five value slots with the
dash sentinel preserved and empty/None coerced to ``-``, page and
page-line, plus the env-toggled Notes column (…:27, 730-731).

Column names are the snake_case forms of the reference headers
(…:724-731) so results stay SQL-oracle-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.names import alternate_name_col, name_parts_cols

CSV_COLUMNS = (
    "name",
    "alternate_name",
    "surname",
    "given_names",
    "suffix",
    "acres_improved",
    "acres_unimproved",
    "cash_value_farm",
    "value_implements",
    "value_livestock",
    "page",
    "page_line",
)


def _render_slot(column: str) -> F.Column:
    value = F.trim(F.coalesce(F.col(column).cast("string"), F.lit("-")))
    return F.when(value.isin("", "None"), F.lit("-")).otherwise(value).alias(column)


def to_census_csv(
    records: DataFrame, add_notes: bool = True, keep_doc_id: bool = False
) -> DataFrame:
    """Assembled records → the 12/13-column census output frame.

    ``keep_doc_id`` prepends the document identity for per-document
    sinks (sources.csv_sink partitions on it; partition columns stay
    out of the CSV payload, so the file contract is unchanged).
    """
    name = F.col("name")
    surname, given, suffix = name_parts_cols(name)
    cols = [
        *([F.col("doc_id")] if keep_doc_id else []),
        name.alias("name"),
        alternate_name_col(name).alias("alternate_name"),
        surname.alias("surname"),
        given.alias("given_names"),
        suffix.alias("suffix"),
        _render_slot("acres_improved"),
        _render_slot("acres_unimproved"),
        _render_slot("cash_value_farm"),
        _render_slot("value_implements"),
        _render_slot("value_livestock"),
        F.col("page"),
        F.col("page_line"),
    ]
    if add_notes:
        cols.append(F.lit("").alias("notes"))
    return records.filter(F.trim(F.col("name")) != "").select(*cols)

"""Z-order (Morton) interleaved sort keys for multi-column data layout.

Sorting a table by ``zorder_key(a, b)`` before writing clusters rows
that are close in *both* dimensions into the same files/row-groups, so
parquet min/max statistics prune scans for predicates on either column
— the lakehouse data-layout trick (Delta OPTIMIZE ZORDER, Iceberg
sort orders) expressed as a plain codegen column: pure integer
shift/mask/or, no UDF, no sort-order plugin.

``zorder_sql`` emits the identical arithmetic as engine-portable SQL
so oracle checks can hash-verify key construction bit for bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each integer column.

    Bit ``i`` of column ``j`` lands at output bit ``i * n_cols + j``;
    2 columns × 8 bits → a 16-bit Morton key.  Columns must already be
    non-negative integers scaled to fit ``bits`` (clamped here for
    safety).  The whole key is one codegen expression tree of
    ``4 * bits * n_cols`` integer ops.
    """
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        clamped = F.least(
            F.greatest(c.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
        )
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(clamped, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql(cols: list[str], bits: int = 8) -> str:
    """The same Morton key as portable SQL (DuckDB oracle twin)."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        clamped = f"LEAST(GREATEST(CAST({c} AS BIGINT), 0), {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"((({clamped} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame, path: str, zcol: Column, partitions: int = 32
) -> None:
    """Range-repartition by the z-key and sort within partitions before
    writing — each output file covers a compact z-range, i.e. a small
    hyper-rectangle of the original columns, maximizing row-group
    min/max pruning for multi-column predicates."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

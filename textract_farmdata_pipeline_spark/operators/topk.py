"""Two-phase distributed top-k per group: pre-reduce before the shuffle.

A plain ``row_number() OVER (PARTITION BY g ORDER BY v)`` filter is
exact but shuffles EVERY input row to the reducer that owns its group —
at 100 TB that's the whole table through the wire to keep k rows per
group.  The scale-safe form mirrors what map-side combine does for
aggregates: each input partition first trims itself to its local top-k
per group (no shuffle, Arrow-batched), so the exchange moves at most
``partitions x groups x k`` rows, then an exact window rank finishes
the job on the survivors.

Equivalence to the one-phase window holds whenever the ordering is
total (tie columns make it deterministic): a row outside its
partition's local top-k cannot be in the global top-k.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tie_cols: Sequence[str] = (),
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-``k`` rows per group, shuffle-reduced.

    Phase 1 (``mapInPandas``): stream each partition's Arrow batches,
    carrying a running per-group top-k (``sort_values().groupby().head(k)``
    after each batch) so partition memory stays O(groups x k) regardless
    of partition size.  Phase 2: ``row_number`` window over the trimmed
    survivors, filtered to ``<= k``.

    ``tie_cols`` (always ascending) must make the order total — the
    phase-1 trim and the phase-2 rank use the same full ordering, which
    is what makes the two-phase result identical to the one-phase
    window.  Output adds ``rank_col`` (long, 1-based).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    group_cols = list(group_cols)
    tie_cols = list(tie_cols)
    sort_cols = [order_col, *tie_cols]
    sort_asc = [ascending] + [True] * len(tie_cols)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            pool = pdf if carry is None else pd.concat([carry, pdf], ignore_index=True)
            carry = (
                pool.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
                .groupby(group_cols, sort=False, dropna=False)
                .head(k)
            )
        if carry is not None:
            yield carry

    trimmed = df.mapInPandas(local_topk, schema=df.schema)
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        *[F.col(c).asc() for c in tie_cols],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        trimmed.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )

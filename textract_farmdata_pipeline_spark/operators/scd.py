"""Slowly-changing-dimension (type 2) merge as pure DataFrame ops.

The upsert-with-history primitive a training-data catalog needs
(document metadata versions, license changes, source re-crawls)
expressed without a table format: one join pass classifies rows, a
union assembles the next snapshot.  On a lakehouse table the same
logic is MERGE INTO; this formulation is the engine-agnostic core and
is what the oracle can hash-check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN = None  # valid_to of the current version


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a batch of updates to an SCD2 history table.

    ``current``: (key, attrs..., valid_from, valid_to) with exactly one
    open (``valid_to IS NULL``) row per key.  ``updates``: (key,
    attrs..., ts) with at most one row per key (pre-deduped to the
    latest).  Returns the new history:

    * closed rows pass through untouched,
    * an open row whose attrs differ from its update is closed at the
      update's ``ts``,
    * changed and brand-new keys get a fresh open row effective ``ts``,
    * open rows with no (or an identical) update stay open.

    One shuffle on the key for the single left join; everything else
    is narrow.  Attribute comparison is null-safe (``<=>``).
    """
    upd = updates.select(
        F.col(key).alias("_u_key"),
        F.col(ts_col).alias("_u_ts"),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
    )
    closed = current.filter(F.col(valid_to).isNotNull())
    open_rows = current.filter(F.col(valid_to).isNull())

    changed: Column = ~F.expr(
        " AND ".join(f"({a} <=> _u_{a})" for a in attrs)
    )
    joined = open_rows.join(upd, open_rows[key] == upd["_u_key"], "left")

    # open rows: keep open unless a differing update closes them
    kept_open = joined.filter(
        F.col("_u_key").isNull() | ~changed
    ).select(*current.columns)
    newly_closed = joined.filter(
        F.col("_u_key").isNotNull() & changed
    ).select(
        *[F.col(c) for c in current.columns if c != valid_to],
        F.col("_u_ts").alias(valid_to),
    )
    # fresh versions: differing updates + keys not in current at all
    fresh_src = upd.join(
        open_rows.select(F.col(key), *[F.col(a).alias(f"_c_{a}") for a in attrs]),
        F.col("_u_key") == F.col(key),
        "left",
    ).filter(
        F.col(key).isNull()
        | ~F.expr(" AND ".join(f"(_c_{a} <=> _u_{a})" for a in attrs))
    )
    fresh = fresh_src.select(
        F.col("_u_key").alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_ts").alias(valid_from),
        F.lit(OPEN).cast(dict(current.dtypes)[valid_to]).alias(valid_to),
    ).select(*current.columns)

    return closed.unionByName(kept_open).unionByName(newly_closed).unionByName(fresh)

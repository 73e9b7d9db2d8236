"""Temporal joins Spark lacks as built-ins: as-of and range joins.

Composed from existing DataFrame operators (SURVEY §2 mapping rule (a)):

* :func:`asof_join` — "latest right row at or before each left row" via
  the union + last(ignorenulls) window trick: both sides merge into one
  partitioned time-ordered stream, the right side's values forward-fill,
  and left rows surface with the fill attached.  One shuffle on the
  ``by`` key (the same exchange a sort-merge join would pay), no
  per-row probing, no skew-prone inequality join.
* :func:`range_join` — inequality band join made shuffle-friendly by
  bucketizing time into ``width``-sized cells: each left row lands in
  one bucket, each right row is replicated into every bucket its match
  band overlaps (bounded by band/width), and the join becomes an
  equi-join on (by, bucket) + residual band filter.  At 100 TB this is
  the difference between a broadcast-nested-loop and a hash join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    values: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (inclusive —
    DuckDB ``ASOF JOIN`` semantics, which the oracle uses directly).

    ``values`` are the right-side columns to attach (as ``{v}{suffix}``);
    unmatched left rows get NULLs.
    """
    by = list(by)
    lcols = left.columns
    l_sel: list[Column] = [F.col(c) for c in lcols] + [F.lit(1).alias("_side")]
    r_sel: list[Column] = []
    for c in lcols:
        if c in by or c == on:
            r_sel.append(F.col(c))
        else:
            r_sel.append(F.lit(None).cast(dict(left.dtypes)[c]).alias(c))
    r_sel.append(F.lit(0).alias("_side"))
    rtypes = dict(right.dtypes)
    for v in values:
        l_sel.append(F.lit(None).cast(rtypes[v]).alias(f"{v}{suffix}"))
        r_sel.append(F.col(v).alias(f"{v}{suffix}"))

    merged = left.select(*l_sel).unionByName(right.select(*r_sel))
    # right rows (_side=0) sort before left rows at equal time → the
    # fill at time t includes a right row at exactly t (inclusive asof)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in values:
        merged = merged.withColumn(
            f"{v}{suffix}", F.last(f"{v}{suffix}", ignorenulls=True).over(w)
        )
    return merged.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    lower: int,
    upper: int,
    width: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Band join: pairs where ``left.on - lower <= right.on <= left.on
    + upper`` within the same ``by`` group.

    ``width`` (default: the band size) is the bucket granularity; right
    rows replicate into ceil(band/width)+1 buckets, left rows into one,
    then an equi-join on (by, bucket) + exact band filter.  Pick width
    ≈ band so the replication factor stays ~2.
    """
    by = list(by)
    width = width or max(1, lower + upper)
    # a right row at t matches left rows in [t - upper, t + lower]; it
    # must therefore replicate into every width-bucket that interval
    # touches: floor((t-upper)/width) .. floor((t+lower)/width)
    n_buckets = (lower + upper) // width + 1

    l = left.withColumn("_bucket", F.floor(F.col(on) / width))
    offsets = F.sequence(F.lit(0), F.lit(n_buckets))
    rt = F.col(f"{on}{suffix}")
    r = right.select(
        *by,
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c not in by and c != on],
    ).withColumn(
        "_bucket",
        F.explode(F.transform(offsets, lambda i: F.floor((rt - upper) / width) + i)),
    )
    cond = (rt >= F.col(on) - lower) & (rt <= F.col(on) + upper)
    return l.join(r, [*by, "_bucket"]).filter(cond).drop("_bucket")


def gap_fill_forward(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid with
    forward-fill.

    Per key: bucket events to the grid (one aggregate), build the
    key's dense spine with ``sequence``-``explode`` (a Generate off a
    2-column aggregate — the spine is never materialized driver-side),
    left-join observations onto it, and forward-fill with a running
    ``last(..., ignorenulls=True)`` window.  Two shuffles total (bucket
    agg, spine join+window share the key partitioning).  The standard
    prep for ML feature frames / downsampled dashboards over sparse
    telemetry.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.date_trunc(
        "day", F.col(ts_col)
    )
    hourly = (
        events.groupBy(F.col(key_col), bucket.alias("bucket_ts"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("bucket_value"),
            F.count("*").alias("n_events"),
        )
    )
    spine = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket_ts"),
        )
    )
    filled = spine.join(hourly, [key_col, "bucket_ts"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        key_col,
        "bucket_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last("bucket_value", ignorenulls=True).over(w).alias("value_ff"),
        F.col("bucket_value").isNull().alias("is_gap"),
    )


def cogroup_conversion_stats(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel stats via ``cogroup().applyInPandas``.

    Demonstrates the co-grouped custom-op shape: both inputs hash to
    the same key partitioning and each key's two groups arrive as a
    pandas pair — the escape hatch when per-key logic needs both sides
    at once and isn't a join (sequence alignment, per-entity model
    scoring, custom sessionization).  Here the logic is deliberately
    SQL-expressible (counts, first times, converted flag) so the
    DuckDB oracle can hash-check the plumbing end-to-end.

    One shuffle per side (same key), Arrow-batched transfer, no
    driver involvement.
    """
    import pandas as pd

    def stats(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        (user_id,) = key
        first_click = int(left["ts_us"].min()) if len(left) else None
        first_buy = int(right["ts_us"].min()) if len(right) else None
        converted = (
            first_click is not None
            and first_buy is not None
            and first_buy >= first_click
        )
        return pd.DataFrame(
            [
                (
                    user_id,
                    len(left),
                    len(right),
                    first_click,
                    first_buy,
                    converted,
                )
            ],
            columns=[
                "user_id",
                "n_clicks",
                "n_purchases",
                "first_click_us",
                "first_purchase_us",
                "converted",
            ],
        )

    lc = clicks.select(
        F.col(key_col), F.unix_micros(F.col(ts_col)).alias("ts_us")
    )
    rc = purchases.select(
        F.col(key_col), F.unix_micros(F.col(ts_col)).alias("ts_us")
    )
    return (
        lc.groupBy(key_col)
        .cogroup(rc.groupBy(key_col))
        .applyInPandas(
            stats,
            "user_id long, n_clicks long, n_purchases long, "
            "first_click_us long, first_purchase_us long, converted boolean",
        )
    )

"""Two-phase top-k: exact equivalence to the one-phase window, carry
correctness across Arrow batches, and the shuffle-reduction plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from textract_farmdata_pipeline_spark.operators.topk import topk_per_group


def one_phase(df, group_cols, order_col, k, ascending, tie_cols):
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        *[F.col(c).asc() for c in tie_cols],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def as_set(df):
    return {tuple(r) for r in df.collect()}


class TestTopkPerGroup:
    def test_equals_one_phase_window(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        )
        two = topk_per_group(
            orders, ["o_orderpriority"], "o_totalprice", 5, tie_cols=["o_orderkey"]
        )
        one = one_phase(orders, ["o_orderpriority"], "o_totalprice", 5, False, ["o_orderkey"])
        assert as_set(two) == as_set(one)

    def test_ascending_and_multi_group(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        ties = ["l_orderkey", "l_linenumber", "l_extendedprice"]
        two = topk_per_group(
            li, ["l_returnflag", "l_linestatus"], "l_extendedprice", 3,
            ascending=True, tie_cols=ties[:2],
        )
        one = one_phase(
            li, ["l_returnflag", "l_linestatus"], "l_extendedprice", 3, True, ties[:2]
        )
        # duplicate (orderkey, linenumber) rows exist in the synthetic
        # lineitem; compare on the full selected tuple which is total
        assert as_set(two) == as_set(one)

    def test_carry_across_small_arrow_batches(self, spark):
        """Force many tiny Arrow batches through one partition so the
        running-trim carry path (concat + re-trim per batch) is what
        produces the result."""
        rows = [(i % 3, i, float((i * 37) % 101)) for i in range(1000)]
        df = (
            spark.createDataFrame(rows, "g int, id long, v double")
            .coalesce(1)
        )
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        try:
            two = topk_per_group(df, ["g"], "v", 7, tie_cols=["id"])
            one = one_phase(df, ["g"], "v", 7, False, ["id"])
            assert as_set(two) == as_set(one)
        finally:
            if old is not None:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_k_validation(self, spark):
        df = spark.range(1).withColumn("g", F.lit(1))
        with pytest.raises(ValueError):
            topk_per_group(df, ["g"], "id", 0)

    def test_phase1_runs_before_exchange(self, spark, sf_dir):
        """The local trim (Python eval) must sit below the window's
        Exchange — that ordering is the whole point of the operator."""
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        )
        two = topk_per_group(
            orders, ["o_orderpriority"], "o_totalprice", 5, tie_cols=["o_orderkey"]
        )
        plan = two._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        eval_depth = [i for i, l in enumerate(lines) if "MapInPandas" in l or "PythonMapInArrow" in l]
        exch_depth = [i for i, l in enumerate(lines) if "Exchange" in l]
        assert eval_depth and exch_depth
        # physical plans print top-down: the Exchange (later stage) must
        # appear ABOVE the python eval (earlier stage)
        assert min(exch_depth) < min(eval_depth)

"""As-of and range join edge semantics (operators/temporal.py)."""

from __future__ import annotations


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_basic_latest_at_or_before(self, spark):
        from textract_farmdata_pipeline_spark.operators.temporal import asof_join

        left = _df(
            spark,
            [(1, 10, 15), (2, 10, 20), (3, 10, 5), (4, 99, 50)],
            "event_id long, user_id long, ts long",
        )
        right = _df(
            spark,
            [(10, 10, 1.5), (10, 20, 2.5)],
            "user_id long, ts long, value double",
        )
        out = {
            r["event_id"]: r["value_asof"]
            for r in asof_join(left, right, on="ts", by=("user_id",), values=("value",)).collect()
        }
        assert out[1] == 1.5  # between the two right rows
        assert out[2] == 2.5  # equal ts → inclusive
        assert out[3] is None  # before any right row
        assert out[4] is None  # user with no right rows at all

    def test_left_rows_all_survive(self, spark):
        from textract_farmdata_pipeline_spark.operators.temporal import asof_join

        left = _df(spark, [(i, i % 3, i * 7) for i in range(30)], "event_id long, user_id long, ts long")
        right = _df(spark, [(0, 50, 9.0)], "user_id long, ts long, value double")
        out = asof_join(left, right, on="ts", by=("user_id",), values=("value",))
        assert out.count() == 30

    def test_multiple_value_columns(self, spark):
        from textract_farmdata_pipeline_spark.operators.temporal import asof_join

        left = _df(spark, [(1, 1, 100)], "event_id long, user_id long, ts long")
        right = _df(
            spark,
            [(1, 90, 1.0, "a"), (1, 95, 2.0, "b")],
            "user_id long, ts long, v double, tag string",
        )
        row = asof_join(left, right, on="ts", by=("user_id",), values=("v", "tag")).collect()[0]
        assert row["v_asof"] == 2.0 and row["tag_asof"] == "b"


class TestRangeJoin:
    def test_band_boundaries_inclusive(self, spark):
        from textract_farmdata_pipeline_spark.operators.temporal import range_join

        left = _df(spark, [(1, 1, 1000)], "event_id long, user_id long, ts long")
        right = _df(
            spark,
            [(1, 900, 1.0), (1, 999, 2.0), (1, 1000, 3.0), (1, 1100, 4.0), (1, 1101, 5.0)],
            "user_id long, ts long, value double",
        )
        got = {
            r["value_r"]
            for r in range_join(
                left, right, on="ts", by=("user_id",), lower=0, upper=100
            ).collect()
        }
        # band is [1000, 1100]: 900/999 too early, 1101 too late
        assert got == {3.0, 4.0}

    def test_symmetric_band_and_no_duplicate_pairs(self, spark):
        from textract_farmdata_pipeline_spark.operators.temporal import range_join

        left = _df(
            spark, [(i, 1, i * 10) for i in range(100)], "event_id long, user_id long, ts long"
        )
        right = _df(
            spark, [(1, i * 10 + 5, float(i)) for i in range(100)], "user_id long, ts long, value double"
        )
        out = range_join(left, right, on="ts", by=("user_id",), lower=20, upper=20, width=10)
        rows = [(r["event_id"], r["ts_r"]) for r in out.collect()]
        assert len(rows) == len(set(rows)), "bucketization must not duplicate pairs"
        # each left ts t matches right ts in [t-20, t+20]: 4 of the +5 grid
        from collections import Counter

        counts = Counter(e for e, _ in rows)
        interior = [c for e, c in counts.items() if 2 <= e <= 97]
        assert interior and all(c == 4 for c in interior)

    def test_matches_naive_inequality_join(self, spark):
        from pyspark.sql import functions as F

        from textract_farmdata_pipeline_spark.operators.temporal import range_join

        left = _df(
            spark,
            [(i, i % 5, (i * 37) % 1000) for i in range(200)],
            "event_id long, user_id long, ts long",
        )
        right = _df(
            spark,
            [(i % 5, (i * 53) % 1000, float(i)) for i in range(200)],
            "user_id long, ts long, value double",
        )
        fast = range_join(left, right, on="ts", by=("user_id",), lower=30, upper=70)
        naive = (
            left.alias("l")
            .join(right.alias("r"), F.col("l.user_id") == F.col("r.user_id"))
            .filter(
                (F.col("r.ts") >= F.col("l.ts") - 30) & (F.col("r.ts") <= F.col("l.ts") + 70)
            )
            .select(F.col("l.event_id"), F.col("r.ts").alias("ts_r"), F.col("r.value").alias("value_r"))
        )
        a = sorted((r["event_id"], r["ts_r"], r["value_r"]) for r in fast.collect())
        b = sorted((r["event_id"], r["ts_r"], r["value_r"]) for r in naive.collect())
        assert a == b

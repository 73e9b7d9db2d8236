"""Spark-4 Python DataSource (Textract) and bucketed co-located joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


class TestTextractDataSource:
    @pytest.fixture(scope="class")
    def registered(self, spark):
        from textract_farmdata_pipeline_spark.sources.datasource import (
            TextractDataSource,
        )

        spark.dataSource.register(TextractDataSource)
        return spark

    def test_reads_per_file_partitions(self, registered):
        df = (
            registered.read.format("textract_ocr")
            .option("bucket", "b")
            .option("keys", "raw/doc-0.pdf,raw/doc-1.pdf,raw/doc-2.pdf")
            .option("backend", "fake")
            .load()
        )
        assert df.select("doc_id").distinct().count() == 3
        # one partition per document = the OCR fan-out axis
        assert df.rdd.getNumPartitions() == 3

    def test_composes_with_pipeline(self, registered):
        from textract_farmdata_pipeline_spark.plans import run_pipeline

        df = (
            registered.read.format("textract_ocr")
            .option("bucket", "b")
            .option("keys", "raw/doc-0.pdf,raw/doc-1.pdf")
            .option("backend", "fake")
            .load()
        )
        out = run_pipeline(df)
        assert out.count() > 0
        assert "name" in out.columns

    def test_datasource_matches_mapinpandas_connector(self, registered):
        """Same backend through both packagings → identical rows."""
        from textract_farmdata_pipeline_spark.sources.fake_ocr import fake_ocr_lines

        ds = (
            registered.read.format("textract_ocr")
            .option("bucket", "fake-bucket")
            .option("keys", ",".join(f"rawfarmdata/doc-{i}.pdf" for i in range(3)))
            .option("backend", "fake")
            .load()
        )
        mip = fake_ocr_lines(registered, "", n_docs=3)
        a = sorted(map(tuple, ds.collect()))
        b = sorted(map(tuple, mip.collect()))
        assert a == b


class TestBucketedJoin:
    def test_bucketed_join_elides_exchanges(self, spark, sf_dir, tmp_path_factory):
        from textract_farmdata_pipeline_spark.operators.bucketing import (
            count_shuffles,
            joined_bucketed,
            write_bucketed,
        )

        base = tmp_path_factory.mktemp("bucketed")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, path=str(base / "o"))
        write_bucketed(lineitem, "t_lineitem_b", ["o_orderkey"], 8, path=str(base / "l"))

        # disable broadcast so the join strategy is genuinely SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = joined_bucketed(spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"])
            n_bucketed = count_shuffles(joined)
            plain = spark.read.parquet(f"{sf_dir}/orders.parquet").join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            n_plain = count_shuffles(plain)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        assert n_bucketed == 0, "bucketed join must not shuffle either side"
        assert n_plain >= 2, "sanity: the unbucketed SMJ shuffles both sides"
        # and it still returns the right rows
        assert joined.count() == plain.count()


class TestStreamingDataSource:
    @pytest.fixture(scope="class")
    def registered(self, spark):
        from textract_farmdata_pipeline_spark.sources.datasource import (
            TextractDataSource,
        )

        spark.dataSource.register(TextractDataSource)
        return spark

    def test_stream_matches_batch_and_batches_by_offset(self, registered, tmp_path):
        """readStream through the same DataSource: one file per
        micro-batch (offset advance = files_per_trigger), total rows
        identical to the batch read."""
        keys = ",".join(f"raw/doc-{i}.pdf" for i in range(3))
        batch = (
            registered.read.format("textract_ocr")
            .option("bucket", "b").option("keys", keys)
            .option("backend", "fake").load()
        )
        stream = (
            registered.readStream.format("textract_ocr")
            .option("bucket", "b").option("keys", keys)
            .option("backend", "fake").option("files_per_trigger", "1")
            .load()
        )
        want = sorted(map(tuple, batch.collect()))
        q = (
            stream.writeStream.format("memory").queryName("ocr_stream_mem")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt-ds"))
            .start()
        )
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            if registered.table("ocr_stream_mem").count() >= len(want):
                break
            time.sleep(1)
        q.stop()
        got = sorted(map(tuple, registered.table("ocr_stream_mem").collect()))
        assert got == want
        # offset pacing: three non-empty micro-batches, one per file
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches == 3

"""JSONL source/sink: roundtrip fidelity (unicode, embedded newlines,
NULLs), corrupt-record policy, deterministic sharding, and the
no-inference guard."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from textract_farmdata_pipeline_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl_shards,
)

SCHEMA = "id long, text string, tag string"


class TestJsonlRoundtrip:
    def test_hard_content_survives(self, spark):
        rows = [
            (1, 'quote " backslash \\ tab\there', "a"),
            (2, "embedded\nnewline and unicode é中\U0001f600", "b"),
            (3, None, None),  # NULL text and tag
            (4, "", "empty"),
            (5, "control char \x01 and \x7f", None),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = tempfile.mkdtemp(prefix="jsonl_t_")
        write_jsonl_shards(df, out)
        back = read_jsonl(spark, out, SCHEMA).select("id", "text", "tag")
        assert sorted(map(tuple, back.collect())) == sorted(rows)

    def test_deterministic_shards(self, spark):
        df = spark.range(200).select(
            F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("text")
        )
        out1 = tempfile.mkdtemp(prefix="jsonl_s1_")
        out2 = tempfile.mkdtemp(prefix="jsonl_s2_")
        write_jsonl_shards(df, out1, shard_col="id", n_shards=4)
        write_jsonl_shards(df, out2, shard_col="id", n_shards=4)
        parts1 = sorted(p for p in os.listdir(out1) if p.startswith("part-"))
        assert len(parts1) == 4
        # same row -> same shard index on every run
        def shard_map(out, parts):
            m = {}
            for i, p in enumerate(sorted(parts)):
                with open(os.path.join(out, p)) as fh:
                    for line in fh:
                        import json

                        m[json.loads(line)["id"]] = i
            return m

        parts2 = sorted(p for p in os.listdir(out2) if p.startswith("part-"))
        assert shard_map(out1, parts1) == shard_map(out2, parts2)

    def test_shard_args_validated(self, spark):
        df = spark.range(5).withColumn("text", F.lit("x"))
        with pytest.raises(ValueError, match="together"):
            write_jsonl_shards(df, "/tmp/never", n_shards=4)
        with pytest.raises(ValueError, match="positive"):
            write_jsonl_shards(df, "/tmp/never", shard_col="id", n_shards=0)


class TestJsonlCorruptPolicy:
    @pytest.fixture()
    def mixed_dir(self):
        d = tempfile.mkdtemp(prefix="jsonl_c_")
        with open(os.path.join(d, "part-00000.json"), "w") as fh:
            fh.write('{"id": 1, "text": "ok", "tag": "a"}\n')
            fh.write('{"id": 2, "text": "truncated\n')  # invalid JSON
            fh.write('{"id": 3, "text": "ok3", "tag": "c"}\n')
        return d

    def test_permissive_captures_corrupt(self, spark, mixed_dir):
        back = read_jsonl(spark, mixed_dir, SCHEMA)
        assert "_corrupt_record" in back.columns
        good = back.filter(F.col("_corrupt_record").isNull())
        bad = back.filter(F.col("_corrupt_record").isNotNull())
        assert {r["id"] for r in good.collect()} == {1, 3}
        brows = bad.collect()
        assert len(brows) == 1 and brows[0]["id"] is None
        assert brows[0]["_corrupt_record"].startswith('{"id": 2')

    def test_failfast_raises(self, spark, mixed_dir):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        with pytest.raises((Py4JJavaError, PySparkException)):
            read_jsonl(spark, mixed_dir, SCHEMA, mode="FAILFAST").collect()

    def test_schema_required(self, spark):
        with pytest.raises(ValueError, match="schema"):
            read_jsonl(spark, "/tmp/never", "")


class TestJsonlRegistryParity:
    def test_roundtrip_matches_oracle(self, spark, sf_dir):
        import duckdb

        from textract_farmdata_pipeline_spark.registry import ORACLES, QUERIES

        srows = sorted(
            tuple(r) for r in QUERIES["doc_jsonl_roundtrip"](spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        drows = sorted(con.execute(ORACLES["doc_jsonl_roundtrip"]).fetchall())
        assert srows == drows and srows


class TestCorruptColNameCollision:
    def test_contained_name_does_not_suppress_capture(self, spark):
        """Review regression: a data column whose name merely CONTAINS
        '_corrupt_record' must not suppress corrupt-record capture."""
        import tempfile

        d = tempfile.mkdtemp(prefix="jsonl_cc_")
        with open(os.path.join(d, "part-00000.json"), "w") as fh:
            fh.write('{"id": 1, "pre_corrupt_record_text": "ok"}\n')
            fh.write("not json at all\n")
        back = read_jsonl(spark, d, "id long, pre_corrupt_record_text string")
        assert "_corrupt_record" in back.columns
        bad = [r for r in back.collect() if r["_corrupt_record"] is not None]
        assert len(bad) == 1 and bad[0]["_corrupt_record"] == "not json at all"

    def test_explicit_corrupt_col_in_schema_not_duplicated(self, spark):
        import tempfile

        d = tempfile.mkdtemp(prefix="jsonl_cd_")
        with open(os.path.join(d, "part-00000.json"), "w") as fh:
            fh.write('{"id": 1}\n')
        back = read_jsonl(spark, d, "id long, _corrupt_record string")
        assert back.columns.count("_corrupt_record") == 1


class TestJsonlOptions:
    def test_gzip_roundtrip(self, spark):
        """compression='gzip' shards read back transparently (Spark
        resolves .gz by extension) with content intact."""
        df = spark.range(50).select(
            F.col("id"), F.concat(F.lit("téxt"), F.col("id")).alias("text")
        )
        out = tempfile.mkdtemp(prefix="jsonl_gz_")
        write_jsonl_shards(df, out, shard_col="id", n_shards=2, compression="gzip")
        assert any(p.endswith(".gz") for p in os.listdir(out))
        back = read_jsonl(spark, out, "id long, text string")
        got = sorted((r["id"], r["text"]) for r in back.collect())
        assert got == [(i, f"téxt{i}") for i in range(50)]

    def test_multiline_document(self, spark):
        """multiline=True parses a pretty-printed JSON array file (the
        other common interchange layout)."""
        d = tempfile.mkdtemp(prefix="jsonl_ml_")
        with open(os.path.join(d, "data.json"), "w") as fh:
            fh.write('[\n  {"id": 1, "text": "a"},\n  {"id": 2, "text": "b"}\n]\n')
        back = read_jsonl(spark, d, "id long, text string", multiline=True)
        assert sorted((r["id"], r["text"]) for r in back.collect()) == [
            (1, "a"),
            (2, "b"),
        ]

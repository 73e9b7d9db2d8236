"""Preprocessing operators: cleaning, PII scrubbing, split, chunking."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _one(spark, text):
    from textract_farmdata_pipeline_spark.operators.preprocess import (
        clean_text,
        scrub_pii,
    )

    df = spark.createDataFrame([(text,)], "text string")
    return df.select(scrub_pii(clean_text(F.col("text"))).alias("t")).collect()[0]["t"]


class TestCleanScrub:
    def test_whitespace_and_control_collapse(self, spark):
        assert _one(spark, "a\t\tb\x00c\n\nd  e") == "a b c d e"

    def test_email_redaction(self, spark):
        assert _one(spark, "mail me at john.doe+x@example.co.uk now") == (
            "mail me at <EMAIL> now"
        )

    def test_ssn_before_phone(self, spark):
        # an SSN must not be half-eaten by the phone pattern
        assert _one(spark, "ssn 123-45-6789 end") == "ssn <SSN> end"

    def test_phone_variants(self, spark):
        assert _one(spark, "call (555) 123-4567 or 555.123.4567") == (
            "call <PHONE> or <PHONE>"
        )

    def test_plain_text_untouched(self, spark):
        assert _one(spark, "John Smith, 120, 40") == "John Smith, 120, 40"


class TestDatasetSplit:
    def test_deterministic_and_complete(self, spark):
        from textract_farmdata_pipeline_spark.operators.preprocess import dataset_split

        docs = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
        b = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
        assert a == b
        from collections import Counter

        c = Counter(a.values())
        assert set(c) == {"train", "val", "test"}
        assert 0.85 < c["train"] / 2000 < 0.95  # ~90%

    def test_assignment_stable_under_corpus_growth(self, spark):
        """Adding documents never moves an existing one between splits."""
        from textract_farmdata_pipeline_spark.operators.preprocess import dataset_split

        small = spark.range(500).withColumnRenamed("id", "doc_id")
        big = spark.range(5000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in dataset_split(small).collect()}
        b = {r["doc_id"]: r["split"] for r in dataset_split(big).collect()}
        assert all(b[k] == v for k, v in a.items())


class TestChunking:
    def test_exact_multiple(self, spark):
        from textract_farmdata_pipeline_spark.operators.preprocess import chunk_tokens

        text = " ".join(f"t{i}" for i in range(128))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(chunk_tokens(df, chunk_size=64).collect(), key=lambda r: r["chunk_idx"])
        assert [r["n_chunk_tokens"] for r in rows] == [64, 64]
        assert rows[0]["chunk_text"].split(" ")[0] == "t0"
        assert rows[1]["chunk_text"].split(" ")[0] == "t64"

    def test_short_tail_kept(self, spark):
        from textract_farmdata_pipeline_spark.operators.preprocess import chunk_tokens

        text = " ".join(f"t{i}" for i in range(70))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(chunk_tokens(df, chunk_size=64).collect(), key=lambda r: r["chunk_idx"])
        assert [r["n_chunk_tokens"] for r in rows] == [64, 6]

    def test_overlap_stride(self, spark):
        from textract_farmdata_pipeline_spark.operators.preprocess import chunk_tokens

        text = " ".join(f"t{i}" for i in range(100))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_tokens(df, chunk_size=40, overlap=10).collect(),
            key=lambda r: r["chunk_idx"],
        )
        starts = [r["chunk_text"].split(" ")[0] for r in rows]
        # stride 30: starts 0/30/60; the chunk at 60 reaches t99, so
        # coverage is complete with three windows
        assert starts == ["t0", "t30", "t60"]
        assert rows[-1]["chunk_text"].split(" ")[-1] == "t99"
        # consecutive chunks share exactly `overlap` tokens
        c0 = rows[0]["chunk_text"].split(" ")
        c1 = rows[1]["chunk_text"].split(" ")
        assert c0[-10:] == c1[:10]

    def test_tiny_doc_single_chunk(self, spark):
        from textract_farmdata_pipeline_spark.operators.preprocess import chunk_tokens

        df = spark.createDataFrame([(1, "only three tokens")], "doc_id long, text string")
        rows = chunk_tokens(df, chunk_size=64).collect()
        assert len(rows) == 1 and rows[0]["n_chunk_tokens"] == 3


def _available_doc_fixtures():
    import glob
    import os

    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    env = os.environ.get("SPARK_GRAFT_TEST_SF_DIR")
    if env:
        p = os.path.join(env, "documents.parquet")
        if os.path.exists(p) and p not in paths:
            paths.append(p)
    return paths or ["/root/testdata/sf0.01/documents.parquet"]


class TestMediaFixtureAssumptions:
    @pytest.mark.parametrize("path", _available_doc_fixtures())
    def test_documents_text_is_ascii_and_nonempty(self, spark, path):
        """The multimodal oracles (image features / frame sample /
        audio windows / image resize) compare byte-level Spark
        operators against DuckDB per-CHARACTER SQL (ascii/substr/
        length).  That equivalence — and frame_sample's
        F.decode(frame, 'utf-8') under ANSI — holds only while the
        fixture text is pure ASCII (byte position == char position,
        no frame boundary can split a codepoint) and non-empty.  Pin
        the assumption over EVERY fixture scale present (the driver
        checks at sf0.01, the scale probe replicates sf0.1, tests
        default to sf0.001) so a regeneration of any of them fails
        HERE with a diagnosis instead of as an oracle hash-mismatch."""
        docs = spark.read.parquet(path)
        bad = docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.octet_length("text").alias("n_bytes"),
        ).where(
            F.col("text").isNull()
            | (F.col("n_chars") == 0)
            | (F.col("n_chars") != F.col("n_bytes"))
        )
        offenders = bad.limit(5).collect()
        assert not offenders, (
            "documents fixture violates the ASCII/non-empty assumption the "
            f"multimodal oracles rely on: {offenders}"
        )

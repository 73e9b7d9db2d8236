"""Paragraph-granularity dedup: CCNet keep-first and Dolma Bloom-gated.

Pins (1) the keep-first semantic against a hand-computed planted frame
(cross-doc AND within-doc repeats), (2) the Bloom variant's two
guarantees — zero false negatives always, and false positives that are
MEASURED (n_dropped_bloom >= n_dropped_exact, divergence visible under
a deliberately saturated filter), (3) reassembly edge cases (short
docs, all-paragraphs-dropped docs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from textract_farmdata_pipeline_spark.operators.paragraphs import (
    paragraph_bloom_dedup,
    paragraph_dedup_keepfirst,
)

BOILER = "alpha beta gamma"  # 3 words -> one 3-word paragraph at W=3
UNIQUE1 = "delta epsilon zeta"
UNIQUE2 = "eta theta iota"
UNIQUE3 = "kappa lambda mu"


class TestParagraphKeepFirst:
    def test_keep_first_across_and_within_docs(self, spark):
        """The FIRST (doc_id, chunk_idx) occurrence of a repeated
        paragraph survives; every later copy — in other docs or later
        in the same doc — is dropped."""
        rows = [
            # doc 0: boiler + unique1 + boiler again (within-doc repeat)
            (0, f"{BOILER} {UNIQUE1} {BOILER}"),
            # doc 1: boiler (cross-doc repeat) + unique2
            (1, f"{BOILER} {UNIQUE2}"),
            # doc 2: only boiler -> everything dropped
            (2, BOILER),
            # doc 3: all unique
            (3, UNIQUE3),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_paras_kept"], r["n_paras_dropped"])
            for r in paragraph_dedup_keepfirst(docs, para_words=3).collect()
        }
        assert got[0] == (f"{BOILER} {UNIQUE1}", 2, 1)
        assert got[1] == (UNIQUE2, 1, 1)
        assert got[2] == ("", 0, 1)
        assert got[3] == (UNIQUE3, 1, 0)

    def test_short_doc_single_paragraph(self, spark):
        """A doc shorter than para_words is one whole paragraph (the
        chunker's tail-keeping contract), and a unique one survives."""
        docs = spark.createDataFrame(
            [(0, "solo"), (1, "solo")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_paras_kept"])
            for r in paragraph_dedup_keepfirst(docs, para_words=12).collect()
        }
        assert got[0] == ("solo", 1)  # first occurrence kept
        assert got[1] == ("", 0)  # later copy dropped


class TestParagraphBloomDedup:
    def _frames(self, spark):
        stored = spark.createDataFrame(
            [(100, f"{BOILER} {UNIQUE1}")], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [
                (0, f"{BOILER} {UNIQUE2}"),  # boiler stored -> dropped
                (1, UNIQUE3),  # novel -> kept (unless FP)
                (2, f"{UNIQUE1} {BOILER}"),  # both stored -> all dropped
            ],
            "doc_id long, text string",
        )
        return stored, batch

    def test_exact_drops_and_reassembly(self, spark):
        """At a well-sized filter the bloom decision equals exact
        truth: stored paragraphs drop, novel ones survive, a fully-
        covered doc reassembles to ''."""
        stored, batch = self._frames(spark)
        got = {
            r["doc_id"]: tuple(r)[1:]
            for r in paragraph_bloom_dedup(
                stored, batch, para_words=3, m_bits=1 << 16
            ).collect()
        }
        assert got[0] == (UNIQUE2, 2, 1, 1)
        assert got[1] == (UNIQUE3, 1, 0, 0)
        assert got[2] == ("", 2, 2, 2)

    def test_zero_false_negatives_under_saturation(self, spark, sf_dir):
        """The Bloom guarantee, property-level: at ANY filter size —
        including a deliberately saturated 64-bit one — every exactly-
        stored paragraph is dropped (n_dropped_bloom >= n_dropped_exact
        per doc), and saturation shows up as bloom-exact divergence,
        never the reverse."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stored = docs.filter(F.col("doc_id") % 5 != 0)
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        out = paragraph_bloom_dedup(
            stored, batch, para_words=12, m_bits=64, k=2
        ).persist()
        try:
            assert (
                out.filter(
                    F.col("n_dropped_bloom") < F.col("n_dropped_exact")
                ).count()
                == 0
            )
            # a 64-bit filter over hundreds of paragraphs IS saturated:
            # false positives must exist, proving the exact companion
            # measures something real.
            agg = out.agg(
                F.sum("n_dropped_bloom").alias("b"),
                F.sum("n_dropped_exact").alias("e"),
            ).collect()[0]
            assert agg["b"] > agg["e"]
        finally:
            out.unpersist()

    def test_well_sized_filter_matches_exact(self, spark, sf_dir):
        """At 2^20 bits over the fixture corpus the FP probability is
        ~1e-5 per paragraph — the bloom decision should equal exact
        truth on every doc (and if a collision ever appears at a new
        scale factor, the divergence columns will say so loudly)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = paragraph_bloom_dedup(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
            para_words=12,
            m_bits=1 << 20,
        )
        assert (
            out.filter(F.col("n_dropped_bloom") != F.col("n_dropped_exact")).count()
            == 0
        )

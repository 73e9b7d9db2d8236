"""Property-based checks for the round-9 exact-semantics claims.

Two claims that are easy to state and worth pinning by construction,
not by example:

1. **ExactSubstr exactness** (``substring_dup_spans``): the returned
   spans equal a brute-force O(n²) Python reference — every maximal
   token span whose stride-1 L-windows each occur ≥ min_count times —
   over randomized corpora drawn from a tiny alphabet (tiny alphabet ⇒
   plenty of accidental repeats, phase shifts, and overlapping-merge
   cases the planted fixtures can't enumerate).

2. **Pigeonhole capture exactness** (``dhash_pairs`` contract): for
   arbitrary 64-bit signature pairs within Hamming ``max_hamming <
   n_chunks``, the banded candidate join ALWAYS captures the pair —
   the property that lets the incremental/stream admission oracles
   ignore banding entirely.

Spark round-trips are ~1 s/example, so examples are few but each is a
whole randomized corpus; the seed-stable shrinker still minimizes
failures.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

# tiny alphabet + short docs: repeats and phase shifts are common
token = st.sampled_from(["a", "b", "c"])
doc = st.lists(token, min_size=0, max_size=14).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)

L = 4  # window width for the property runs (fixtures stay small)


def py_substring_spans(texts: list[str], min_len: int, min_count: int):
    """Brute-force reference: count every stride-1 window by TEXT,
    cover duplicated windows, union per-doc intervals."""
    from collections import Counter

    win_counts: Counter = Counter()
    toks = [t.split(" ") for t in texts]
    for ts in toks:
        for i in range(len(ts) - min_len + 1):
            win_counts[" ".join(ts[i : i + min_len])] += 1
    spans = []
    for doc_id, ts in enumerate(toks):
        covered = set()
        for i in range(len(ts) - min_len + 1):
            if win_counts[" ".join(ts[i : i + min_len])] >= min_count:
                covered.update(range(i + 1, i + min_len + 1))  # 1-based
        # maximal runs of covered positions
        run = []
        for p in sorted(covered):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append((doc_id, run[0], run[-1], len(run)))
                run = [p]
        if run:
            spans.append((doc_id, run[0], run[-1], len(run)))
    return sorted(spans)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_substring_spans_match_bruteforce(spark, texts):
    from textract_farmdata_pipeline_spark.operators.corpus import (
        substring_dup_spans,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in substring_dup_spans(docs, min_len=L).collect()
    )
    assert got == py_substring_spans(texts, L, 2)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_incremental_empty_artifact_matches_bruteforce(spark, texts):
    """The ingest form against an empty artifact must also equal the
    brute force — within-batch repeats count toward min_count."""
    from textract_farmdata_pipeline_spark.operators.corpus import (
        incremental_substring_spans,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "h long, c long")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in incremental_substring_spans(empty, docs, min_len=L).collect()
    )
    assert got == py_substring_spans(texts, L, 2)


# signature pairs: a base 64-bit sig and ≤7 flipped bit positions
sig_bits = st.integers(min_value=0, max_value=(1 << 64) - 1)
flip_positions = st.sets(
    st.integers(min_value=0, max_value=63), min_size=0, max_size=7
)


def _words(x: int) -> list[int]:
    return [x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=sig_bits, flips=flip_positions)
def test_pigeonhole_capture_exact_within_radius(spark, base, flips):
    from textract_farmdata_pipeline_spark.operators.similarity import (
        sig_chunk_bands,
    )

    other = base
    for p in flips:
        other ^= 1 << p
    sig = spark.createDataFrame(
        [(1, _words(base)), (2, _words(other))],
        "doc_id long, sig array<bigint>",
    )
    bands = sig_chunk_bands(sig, 8, id_col="doc_id")
    shared = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .count()
    )
    # ≤7 flips touch ≤7 of the 8 chunks: at least one chunk agrees
    assert shared >= 1

"""Text-analysis operators over document tables (north-star surface).

All operators are pure Column expressions (JVM-side, codegen'd) so they
scale linearly with no Python in the hot path: token statistics,
quality scoring, language guess (stopword heuristic) and positional
document fingerprints.  ``BASELINE.json``'s north star asks for these
beyond the reference's own surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English function-word list for the stopword heuristics.
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token counting + distinct-token stats per document."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # chars excluding the single separating spaces, per token
        ((F.length(F.col(text_col)) - (n - F.lit(1))) / n.cast("double")).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: stopword ratio, uniqueness ratio, length."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_chars_measured"),
        (stop_hits / n).alias("stopword_ratio"),
        (uniq / n).alias("uniq_token_ratio"),
    )


def language_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic (n-gram-free LID stand-in):
    texts with enough English function words are tagged ``en``."""
    toks = _tokens(F.col(text_col))
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / F.size(
        toks
    ).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted 32-bit-word fingerprint per document.

    ``sum((pos+1) * int(md5(token)[:8], 16))`` — integer arithmetic, so
    the result is exact and associative (safe under any aggregation
    order / partitioning, unlike float hashes).  Distributed via
    posexplode + groupBy (map-side partial aggregation applies).
    """
    toks = F.posexplode(_tokens(F.col(text_col)))
    exploded = docs.select("doc_id", toks.alias("pos", "token"))
    word_int = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
    return (
        exploded.select("doc_id", ((F.col("pos") + 1) * word_int).alias("term"))
        .groupBy("doc_id")
        .agg(F.sum("term").alias("fingerprint"))
    )

"""Text-analysis operators over document tables (north-star surface).

All operators are pure Column expressions (JVM-side, codegen'd) so they
scale linearly with no Python in the hot path: token statistics,
quality scoring, language guess (stopword heuristic) and positional
document fingerprints.  ``BASELINE.json``'s north star asks for these
beyond the reference's own surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Small English function-word list for the stopword heuristics.
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def stopword_filter(toks: Column) -> Column:
    """The tokens of ``toks`` that are in :data:`STOPWORDS` — the ONE
    definition of a stopword hit shared by every quality signal
    (scores, the LID heuristic, the Gopher rule, the source gate), so
    a list or tokenizer change cannot drift them apart.  ``filter``'s
    lambda is interpreted (ArrayFilter is CodegenFallback), which is
    acceptable here because every consumer evaluates it once per
    document in a scan stage — never per token row or inside a join."""
    return F.filter(toks, lambda t: t.isin(*STOPWORDS))


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
    stop_hits = F.size(stopword_filter(toks)).cast("double")
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
    ratio = F.size(stopword_filter(toks)).cast("double") / F.size(
        toks
    ).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
    )


# GPT-style pre-tokenizer simplification: letter runs, digit runs,
# punctuation runs (portable across Java regex and RE2).
BPE_PRETOKEN_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"

# Highest-frequency English character trigrams (public LID folklore —
# the classic Cavnar-Trenkle n-gram profile, top slice).
EN_TRIGRAMS: tuple[str, ...] = ("the", "and", "ing", "ion", "ent", "her", " th", "he ")


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: pre-tokenize into letter/digit/punct runs
    (the unit a byte-pair tokenizer would merge over), vs whitespace."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    ws = _tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(F.array_distinct(bpe)).cast("long").alias("n_distinct_bpe_tokens"),
    )


def language_guess_ngram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-n-gram LID heuristic: density of top English trigrams.

    Occurrences counted via length-difference after deletion — one
    codegen'd expression per trigram, no explode, engine-portable."""
    low = F.lower(F.col(text_col))
    hits = None
    for g in EN_TRIGRAMS:
        occ = (F.length(low) - F.length(F.replace(low, F.lit(g)))) / F.lit(len(g))
        hits = occ if hits is None else hits + occ
    density = hits / F.length(low).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        F.round(density, 6).alias("trigram_density"),
        F.when(density >= 0.01, F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
    )


ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Rabin-Karp rolling hash over the token stream.

    ``h = fold(tok_ints, (acc, x) -> (acc·B + x) mod M)`` seeded with
    the first token's int — order-sensitive (reordered tokens change
    the hash, unlike the positional-sum fingerprint) yet one map-side
    expression per document: the fold is a left-to-right ``aggregate``
    higher-order function, no explode, no shuffle.
    """
    toks = _tokens(F.col(text_col))
    ints = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    n = F.size(ints)
    folded = F.aggregate(
        F.slice(ints, 2, n - 1),
        F.element_at(ints, 1),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )
    return docs.select(
        "doc_id",
        F.when(n == 0, F.lit(0).cast("long")).otherwise(folded).alias("rolling_fp"),
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


def repetition_stats(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Within-document n-gram repetition — the Gopher-style quality rule.

    Per document: total n-grams, the fraction of n-gram instances taken
    by the single most frequent n-gram (``top_ngram_frac``), and the
    fraction of instances whose n-gram occurs more than once
    (``dup_ngram_frac``).  High values mean boilerplate / degenerate
    repetition; filter on them before training.

    Two groupBys, both keyed by (doc_id[, shingle]) so partial
    map-side aggregation applies — per-document state never exceeds
    the document's distinct-n-gram count, independent of corpus size.
    """
    from .corpus import ngram_shingles

    per_gram = (
        ngram_shingles(docs, n, text_col=text_col)
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("cnt"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_ngram_frac"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))) / F.sum("cnt"), 6
        ).alias("dup_ngram_frac"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    use_log: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_tf: bool = False,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    Three stages, each with map-side partial aggregation: term
    frequencies keyed (doc, term); document frequencies keyed (term);
    a join back on term (left to AQE — the vocabulary table is tiny
    relative to the posting list and usually broadcasts) and a
    per-document top-k window.  Corpus size enters as a broadcast
    1-row cross join, never a ``collect``.

    ``use_log=False`` ranks by the raw ``tf * N / df`` ratio instead of
    ``tf * ln(N/df)`` — rational arithmetic only, bit-identical across
    engines (libm ``log`` is not), which is what the DuckDB oracle
    checks.  Rankings agree between the two whenever df ties break the
    same way; the log form is the production default.
    """
    tok = docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
    # tf feeds BOTH the df aggregate and the final join; Spark plans
    # don't share subtrees, so the tokenize+count runs once per
    # consumer.  persist_tf trades cache materialization for that
    # recompute — a loss at small scale (measured ~+30% at sf0.1),
    # the right call when the posting list is corpus-sized.
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if persist_tf:
        tf = tf.persist()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
    if use_log:
        score = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    else:
        score = F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def length_histogram(
    docs: DataFrame, bucket_width: int = 100, length_col: str = "n_chars"
) -> DataFrame:
    """Corpus length distribution in fixed-width buckets.

    Integer bucket arithmetic + one aggregate: the whole histogram is
    a map-side combine down to ~(max_len / width) rows regardless of
    corpus size — the cheapest possible full-corpus profile."""
    bucket = F.floor(F.col(length_col) / bucket_width).cast("long").alias("bucket")
    return (
        docs.groupBy(bucket)
        .agg(
            F.count("*").alias("n_docs"),
            F.min(length_col).cast("long").alias("min_len"),
            F.max(length_col).cast("long").alias("max_len"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * bucket_width).cast("long"))
    )


def lm_support_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cheap corpus-LM fluency signal: how well each document's bigrams
    are supported by the corpus itself.

    The classic training-data quality filter scores documents with an
    n-gram language model (KenLM-style perplexity); this is its
    distributed, exactly-aggregatable core.  The corpus plays the role
    of the model: for every bigram occurrence ``(w1, w2)`` we look up
    the corpus-wide continuation count ``c(w1 w2)`` and context count
    ``c(w1 ·)``, then report per document

    * ``n_bigrams`` — positions scored,
    * ``support_sum = Σ c(w1 w2)``, ``context_sum = Σ c(w1 ·)`` (exact
      BIGINT sums — engine-portable, unlike a float log-prob sum),
    * ``lm_support = support_sum / context_sum`` — ONE IEEE division of
      two exact integers, so the score is bit-identical across engines.
      High ≈ common continuations (fluent/boilerplate); low ≈ unusual
      token transitions (gibberish, OCR noise, wrong language).

    Shape: one Generate explode, two corpus-level aggregates (map-side
    combinable), two equi-joins back on the bigram/context keys, one
    final per-doc aggregate.  No Python, no window, no collect; the
    count tables are corpus-vocabulary-sized and shuffle on the string
    key like any word-count.  Replacing corpus counts with a broadcast
    pretrained table turns this into true LM scoring with one code
    change.
    """
    from .corpus import ngram_shingles

    big = ngram_shingles(docs, 2, text_col=text_col, id_col=id_col).select(
        id_col, "shingle"
    )
    ctx_of = F.substring_index(F.col("shingle"), " ", 1)
    c2 = big.groupBy("shingle").agg(F.count("*").alias("n12"))
    c1 = big.select(ctx_of.alias("ctx")).groupBy("ctx").agg(F.count("*").alias("n1"))
    return (
        big.join(c2, "shingle")
        .join(c1, ctx_of == F.col("ctx"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("n12").alias("support_sum"),
            F.sum("n1").alias("context_sum"),
            (
                F.sum("n12").cast("double") / F.sum("n1").cast("double")
            ).alias("lm_support"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-unit BM25 scores (Robertson/Sparck Jones) for every unit
    containing ≥ 1 query term — the shared scoring core of
    :func:`bm25_topk` (unit = document) and :func:`bm25_maxp` (unit =
    passage chunk, hence the multi-column ``id_cols``), with two
    deliberate engine-portability choices:

    * IDF uses the *rational* odds form ``(N - df + 0.5) / (df + 0.5)``
      without the log wrapper: ``log`` is libm-implementation-specific
      (not correctly rounded), while the odds ratio is a single IEEE
      division of exact integers.  ``log`` is monotone, so top-k sets
      and per-term ordering are unchanged.
    * The per-unit score sums its per-term components in the FIXED
      order of ``terms`` (explicit column addition, not a SUM aggregate),
      so the float result is bit-identical across engines and runs.

    Shape: one token explode, one corpus-length aggregate (scalar,
    broadcast), one (unit, term) count shuffled on the unit key, a
    row-count per term folded into the same scalar broadcast, then a
    map-side score.  Only units containing at least one query term
    survive (retrieval semantics) — the big corpus is never scored
    row-by-row against terms it doesn't contain.
    """
    from functools import reduce

    ids = list(id_cols)
    toks = docs.select(
        *ids, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    dl = docs.select(
        *ids, F.size(F.split(F.col(text_col), " ")).cast("long").alias("dl")
    )
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n"),
    )
    tf = (
        toks.filter(F.col("tok").isin(list(terms)))
        .groupBy(*ids, "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    wide = tf.groupBy(*ids).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("tok") == t, F.col("tf"))),
                F.lit(0).cast("long"),
            ).alias(f"tf_{t}")
            for t in terms
        ]
    )
    scal = dfreq.agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("df"))).alias(f"df_{t}")
            for t in terms
        ]
    ).crossJoin(stats)
    joined = wide.join(dl, ids).crossJoin(F.broadcast(scal))
    comps = []
    for t in terms:
        tf_c, df_c = F.col(f"tf_{t}"), F.col(f"df_{t}")
        idf = (F.col("n") - df_c + F.lit(0.5)) / (df_c + F.lit(0.5))
        denom = tf_c + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
        )
        comps.append(idf * (tf_c * F.lit(k1 + 1.0)) / denom)
    score = reduce(lambda a, c: a + c, comps)
    return joined.select(*ids, *[f"tf_{t}" for t in terms], score.alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k retrieval over a whitespace-tokenized corpus — the
    per-document ranking head over :func:`bm25_scores` (see it for the
    scoring semantics and the two engine-portability choices: rational
    odds IDF without the monotone log wrapper, and per-term components
    added in the FIXED order of ``terms``)."""
    return (
        bm25_scores(docs, terms, k1=k1, b=b, text_col=text_col, id_cols=(id_col,))
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )


def bm25_maxp(
    docs: DataFrame,
    terms: tuple[str, ...],
    chunk_size: int = 32,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passage-level BM25 with MaxP document aggregation (Dai & Callan
    2019): split each document into fixed-size token chunks, score
    CHUNKS against the query (chunk-level df/avgdl — the passage corpus
    is the retrieval collection), and rank documents by their best
    passage.  Long documents stop winning on raw term accumulation —
    the standard fix once documents exceed a retrieval granularity.

    MAX over float chunk scores is order-independent (unlike SUM), so
    MaxP is exactly as hash-checkable as document BM25.  Shapes: the
    chunk explode is a Generate, scoring is :func:`bm25_scores` over
    the chunk table (word-count-shaped aggregations), and the doc
    rollup is one map-side-combinable MAX per doc.
    """
    from .preprocess import chunk_tokens

    chunks = chunk_tokens(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        chunk_size=chunk_size,
    ).select("doc_id", "chunk_idx", F.col("chunk_text").alias("text"))
    scored = bm25_scores(
        chunks, terms, k1=k1, b=b, text_col="text",
        id_cols=("doc_id", "chunk_idx"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_scored_chunks"),
            F.max("bm25").alias("bm25_maxp"),
        )
        .orderBy(F.col("bm25_maxp").desc(), F.col("doc_id"))
        .limit(k)
    )


def gopher_quality_filter(
    docs: DataFrame,
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_distinct_stopwords: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    compress_stats: DataFrame | None = None,
    compress_lo: int = 25,
    compress_hi: int = 75,
) -> DataFrame:
    """Gopher-style composite document-quality gate (Rae et al. 2021,
    appendix A1.1), adapted to this corpus's flat word streams.

    Six rules (plus an optional seventh), each evaluated from
    *integer* quantities so the verdict is bit-identical in any engine
    (no float-threshold edge cases):

    * ``too_short`` / ``too_long`` — word count outside
      ``[min_words, max_words]``.
    * ``word_len_out_of_range`` — mean word length outside
      ``[min_mean_word_len, max_mean_word_len]`` (compared as
      ``total_word_chars vs bound * n_tokens``, no division).
    * ``low_stopword_diversity`` — fewer than
      ``min_distinct_stopwords`` distinct function words (the Gopher
      "stop word" rule).
    * ``top_bigram_repetition`` — the single most frequent bigram
      takes > 1/5 of all bigram instances (``top_cnt * 5 > total``).
    * ``dup_bigram_repetition`` — bigrams occurring more than once
      take > 1/2 of all instances (``dup_cnt * 2 > total``).
    * ``compressibility_out_of_band`` (only when ``compress_stats`` is
      given) — the Dolma-family band rule on a PRECOMPUTED
      ``(id, n_bytes, n_zlib)`` table (from :func:`compressibility` or
      a feature store): fail unless ``compress_lo · n_bytes ≤
      100 · n_zlib ≤ compress_hi · n_bytes``.  Integer-cent
      thresholds, so the GATING DECISION is exact arithmetic on the
      stored integers — the float ratio never enters a comparison;
      empty or missing stats fail the band (pathological by
      definition).

    Output: one row per document with the integer evidence columns, a
    deterministic comma-joined ``failed_rules`` string (fixed rule
    order), and ``keep = (failed_rules = '')``.

    Scale shape: the token-level signals are a single codegen'd
    projection (no shuffle); the bigram signals reuse the
    :func:`repetition_stats` plan — two map-side-combinable groupBys
    keyed by (doc, shingle) then (doc) — and join back on doc_id.
    Nothing in the plan holds more than one document's distinct bigrams
    in an aggregation state, so the filter runs at crawl scale.
    """
    from .corpus import ngram_shingles

    toks = _tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    base = docs.select(
        id_col,
        n.alias("n_tokens"),
        (F.length(F.col(text_col)).cast("long") - (n - F.lit(1))).alias("n_word_chars"),
        F.size(
            F.array_distinct(stopword_filter(toks))
        ).cast("long").alias("n_distinct_stopwords"),
    )
    grams = (
        ngram_shingles(docs, 2, text_col=text_col, id_col=id_col)
        .groupBy(id_col, "shingle")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.max("cnt").alias("top_bigram_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
                "dup_bigram_cnt"
            ),
        )
    )
    j = base.join(grams, id_col, "left")
    extra_cols: list = []
    if compress_stats is not None:
        j = j.join(
            compress_stats.select(id_col, "n_bytes", "n_zlib"), id_col, "left"
        )
        extra_cols = ["n_bytes", "n_zlib"]
    too_short = F.col("n_tokens") < min_words
    too_long = F.col("n_tokens") > max_words
    word_len_bad = (
        F.col("n_word_chars") < F.lit(min_mean_word_len) * F.col("n_tokens")
    ) | (F.col("n_word_chars") > F.lit(max_mean_word_len) * F.col("n_tokens"))
    low_stop = F.col("n_distinct_stopwords") < min_distinct_stopwords
    top_rep = F.coalesce(
        F.col("top_bigram_cnt") * 5 > F.col("n_bigrams"), F.lit(False)
    )
    dup_rep = F.coalesce(
        F.col("dup_bigram_cnt") * 2 > F.col("n_bigrams"), F.lit(False)
    )
    rule_cols = [
        F.when(too_short, F.lit("too_short")),
        F.when(too_long, F.lit("too_long")),
        F.when(word_len_bad, F.lit("word_len_out_of_range")),
        F.when(low_stop, F.lit("low_stopword_diversity")),
        F.when(top_rep, F.lit("top_bigram_repetition")),
        F.when(dup_rep, F.lit("dup_bigram_repetition")),
    ]
    if compress_stats is not None:
        # fail UNLESS lo·n_bytes ≤ 100·n_zlib ≤ hi·n_bytes — exact
        # integer arithmetic on the stored columns; NULL/zero stats
        # coalesce to out-of-band
        in_band = F.coalesce(
            (F.lit(compress_lo) * F.col("n_bytes") <= F.lit(100) * F.col("n_zlib"))
            & (F.lit(100) * F.col("n_zlib") <= F.lit(compress_hi) * F.col("n_bytes"))
            & (F.col("n_bytes") > 0),
            F.lit(False),
        )
        rule_cols.append(F.when(~in_band, F.lit("compressibility_out_of_band")))
    failed = F.concat_ws(",", *rule_cols)
    return j.select(
        id_col,
        "n_tokens",
        "n_word_chars",
        "n_distinct_stopwords",
        "n_bigrams",
        "top_bigram_cnt",
        "dup_bigram_cnt",
        *extra_cols,
        failed.alias("failed_rules"),
        (failed == F.lit("")).alias("keep"),
    )


def cms_sketch(
    docs: DataFrame,
    n: int = 2,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Count-min sketch over token n-grams (Cormode & Muthukrishnan
    2005): ``depth × width`` bucket counts, the fixed-size mergeable
    summary that answers "how often does this phrase occur in 100 TB"
    without materializing the n-gram table.

    The hash family is the repo's engine-portable ``md5_bucket``
    (first 8 md5 hex digits mod ``width``, row-seeded) — deterministic
    and bit-identical in DuckDB, so unlike probabilistic-by-
    implementation sketches (HLL++/t-digest) this one is fully
    hash-oracle-checkable.

    Plan shape: shingle explode (codegen Generate) → ``posexplode`` of
    the ``depth`` bucket ids per shingle → groupBy ``(row, bucket)``.
    The aggregation state is at most ``depth·width`` cells, so
    map-side partial aggregation collapses everything locally and the
    shuffle moves ≤ ``depth·width`` rows per partition regardless of
    corpus size — the whole point of a sketch.
    """
    from .corpus import md5_bucket, ngram_shingles

    sh = ngram_shingles(docs, n, text_col=text_col, id_col=id_col)
    buckets = F.array(
        *[md5_bucket(F.col("shingle"), width, seed=f"cms{i}|") for i in range(depth)]
    )
    return (
        sh.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    depth: int = 4,
    width: int = 1024,
    shingle_col: str = "shingle",
) -> DataFrame:
    """Point-query the sketch: estimate = min over the ``depth`` rows
    of the candidate's bucket count (never under-counts; over-counts
    only on bucket collisions, bounded by ≈ total/width per row).
    The sketch is tiny (≤ depth·width rows) and broadcasts; candidates
    never shuffle.

    The sketch table is sparse (untouched cells have no row), so the
    lookup is a LEFT join with absent cells counting as 0 — a candidate
    the corpus never contained therefore estimates 0 whenever ANY of
    its ``depth`` cells is untouched, exactly the true CMS min."""
    from .corpus import md5_bucket

    cand = candidates.select(
        F.col(shingle_col).alias("shingle"),
        F.posexplode(
            F.array(
                *[
                    md5_bucket(F.col(shingle_col), width, seed=f"cms{i}|")
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        cand.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("shingle")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


# symbol-boundary marker for the string-encoded BPE state: a word's
# symbol sequence [l, o, w] is stored as "\x1el\x1eo\x1ew\x1e".  \x1e
# (ASCII record separator) never occurs in natural text; bpe_train
# strips it from input tokens defensively.
_BPE_SEP = "\x1e"


def _rx_quote(s: str) -> str:
    """Literal-quote ``s`` for a Java regex, exactly as
    ``java.util.regex.Pattern.quote`` does: wrap in ``\\Q..\\E`` and
    split around any embedded ``\\E`` (which would otherwise terminate
    the quoting early and silently corrupt the pattern — reachable once
    merged symbols contain backslash-E sequences, e.g. code corpora)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _apply_bpe_merges(s_col: Column, pairs: list[tuple[str, str]]) -> Column:
    """Greedy left-to-right application of a SET of symbol-disjoint
    merges on the separator-encoded symbol string.

    Each merge (a, b) is one ``regexp_replace`` rewriting
    ``␞a␞b`` → ``␞ab`` with a lookahead ``(?=␞)`` guarding the right
    boundary (unconsumed, so back-to-back occurrences like ``a a a a``
    merge pairwise left-to-right exactly as the classic greedy scan
    does; Java's replaceAll never rescans replaced output, which is
    the same single-pass semantics).  Because the batch's pairs share
    no symbols, no two rewrites compete for a position, so chaining
    them equals applying them sequentially in any order.

    A plain string rewrite replaces the earlier array-fold
    implementation: it codegens to a regex pass with no higher-order
    lambda, cutting both driver-side expression construction and
    executor-side per-row cost by several ×.
    """
    for a, b in pairs:
        pattern = _rx_quote(_BPE_SEP + a + _BPE_SEP + b) + "(?=" + _BPE_SEP + ")"
        repl = (_BPE_SEP + a + b).replace("\\", "\\\\").replace("$", "\\$")
        s_col = F.regexp_replace(s_col, pattern, repl)
    return s_col


def _apply_bpe_merge(s_col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) symbol pairs on the
    separator-encoded symbol string."""
    return _apply_bpe_merges(s_col, [(a, b)])


def _select_disjoint_batch(
    ranked: list, batch_k: int, cutoff_floor: int
) -> list:
    """Pick the maximal batch of merges provably identical to sequential
    BPE.

    ``ranked`` is the top slice of the pair-count table in training
    order (count desc, left asc, right asc).  Step 1 takes the maximal
    clean prefix of pairwise-SYMBOL-disjoint pairs (a merge's output
    string counts as a used symbol too).  Within a clean prefix every
    accepted pair beats every later-ranked OLD pair outright — counts
    of accepted pairs are invariant during the batch (disjointness),
    later pairs' counts can only shrink, and rank order already
    resolves their ties by name.

    The one residual hazard is a RENAMED new pair: merging (a, b)
    creates pairs like (x, ab) whose fresh name re-enters the
    tie-break.  Such a pair is contained in an OLD pair overlapping an
    earlier-accepted symbol ((x, ab) ⊆ (x, a); chained merges reduce to
    boundary symbols the same way), and in a clean prefix every
    overlapping old pair ranks below the whole prefix — so its count,
    hence the new pair's count, is visible in the collected tail.
    Step 2 therefore walks the prefix and truncates at the first pair
    whose count fails to STRICTLY exceed the best tail pair that
    overlaps previously-accepted symbols (``cutoff_floor`` bounds
    pairs beyond the collected slice).  What survives is exactly the
    sequence sequential training would produce — the batch is an
    optimization, not an approximation.
    """
    accepted: list = []
    used: set[str] = set()
    t = len(ranked)
    for i, r in enumerate(ranked):
        a, b = r["a"], r["b"]
        if len(accepted) >= batch_k or a in used or b in used or (a + b) in used:
            t = i
            break
        accepted.append(r)
        used.update((a, b, a + b))
    tail = ranked[t:]
    out: list = []
    prev_syms: set[str] = set()
    for j, r in enumerate(accepted):
        if j > 0:
            danger = cutoff_floor
            for o in tail:
                if o["a"] in prev_syms or o["b"] in prev_syms:
                    danger = max(danger, o["pair_count"])
            if r["pair_count"] <= danger:
                break
        out.append(r)
        prev_syms.update((r["a"], r["b"], r["a"] + r["b"]))
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 5,
    batch_merges: int = 8,
    loop_partitions: int = 8,
) -> list[tuple[int, str, str, str, int]]:
    """Byte-pair-encoding merge training (Sennrich et al. 2016, §3.2)
    over a document corpus: repeatedly merge the most frequent adjacent
    symbol pair, starting from characters.

    Scale shape — the part that matters at 100 TB: the corpus is
    touched ONCE (token explode → word-frequency groupBy); the training
    loop then runs entirely on the *distinct-word* table (vocab-sized,
    weighted by count).  The scale axis BPE is actually sensitive to is
    VOCAB size (30k–100k merges), not data size, and the naive loop
    costs one driver round trip per merge.  Here each Spark job instead
    yields up to ``batch_merges`` merges: the iteration collects the
    top slice of the pair-count table (count desc, left asc, right
    asc), and :func:`_select_disjoint_batch` accepts the provably-safe
    prefix — pairwise-symbol-disjoint pairs whose counts strictly
    dominate every non-accepted candidate, which makes the batched
    merge table IDENTICAL to sequential training (see its docstring
    for the argument; a pytest pins batched == sequential on corpora
    where merges interact).  The accepted batch is applied in one
    chained-``regexp_replace`` pass over the separator-encoded symbol
    string (:func:`_apply_bpe_merges`).  With the Zipfian pair
    distributions real corpora have, top counts are strictly
    decreasing and batches fill, cutting driver round trips ~K×;
    degenerate tie-heavy corpora fall back to batch size 1 — never to
    a wrong table.

    Ties break (count desc, left asc, right asc), so training is
    deterministic.  Lineage is truncated by a tracked localCheckpoint
    every ``checkpoint_every`` applied MERGES (the CC/PageRank
    discipline — without it iteration N replays all earlier merges;
    counting merges, not batches, keeps the un-truncated expression
    depth identical to sequential training so per-job analysis/codegen
    cost doesn't grow with the batch factor), with superseded blocks
    released eagerly.

    Returns the merge table ``[(rank, left, right, merged,
    pair_count), ...]`` — the artifact a tokenizer consumes.  Stops
    early when no pair reaches ``min_pair_count``.
    """
    from .checkpoints import release, tracked_local_checkpoint

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        # defensive: the encoding separator must never appear in a token
        .select(F.replace(F.col("w"), F.lit(_BPE_SEP), F.lit("")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    # "low" -> "␞l␞o␞w␞": boundary-marked per-character symbols.  The
    # loop state is vocab-sized (tiny next to the corpus), so it is
    # coalesced to a few partitions — per-iteration jobs then cost a
    # handful of tasks instead of a full shuffle-partition fan-out.
    encoded = F.concat(
        F.lit(_BPE_SEP), F.regexp_replace("w", "(?s)(.)", "$1" + _BPE_SEP)
    )
    state, ck_ids = tracked_local_checkpoint(
        words.select("cnt", encoded.alias("s")).coalesce(loop_partitions)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    since_ck = 0
    # collect enough ranked pairs that a full disjoint batch plus its
    # cutoff candidate fit in the slice; +1 row detects truncation.
    top_m = batch_merges * 4 + 1
    while len(merges) < n_merges:
        syms = F.filter(F.split("s", _BPE_SEP), lambda x: x != "")
        ranked = (
            state.select("cnt", syms.alias("y"))
            .filter(F.size("y") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice("y", 1, F.size("y") - 1),
                        F.slice("y", 2, F.size("y") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(top_m)
            .collect()
        )
        if not ranked or ranked[0]["pair_count"] < min_pair_count:
            break
        # truncated collection: pairs beyond the slice can count up to
        # the last collected value, so that value bounds the cutoff;
        # a complete collection lets the cutoff fall to the stop floor.
        # ... and in BOTH cases the floor never drops below
        # min_pair_count - 1: sequential training stops at the first
        # sub-threshold best pair, so a batch member that fails to
        # strictly beat min_pair_count - 1 must not be emitted either.
        floor = max(
            ranked[-1]["pair_count"] if len(ranked) == top_m else 0,
            min_pair_count - 1,
        )
        k = min(batch_merges, n_merges - len(merges))
        batch = _select_disjoint_batch(ranked, k, floor)
        if not batch:
            # tie-bound batch: the argmax alone is always sequential-safe.
            batch = [ranked[0]]
        pairs = [(r["a"], r["b"]) for r in batch]
        for r in batch:
            merges.append(
                (len(merges), r["a"], r["b"], r["a"] + r["b"], r["pair_count"])
            )
        state = state.select(
            "cnt", _apply_bpe_merges(F.col("s"), pairs).alias("s")
        )
        since_ck += len(pairs)
        if since_ck >= checkpoint_every:
            state, new_ids = tracked_local_checkpoint(state)
            release(spark, ck_ids)
            ck_ids = new_ids
            since_ck = 0
    release(spark, ck_ids)
    return merges


def _kn_bigrams(d: DataFrame, text_col: str, *extra: str) -> DataFrame:
    """Adjacent-token bigram explode shared by KN estimation and KN
    scoring — ONE definition so model and scorer can never drift on
    tokenization (empty tokens dropped, docs shorter than 2 tokens
    contribute nothing)."""
    toks = F.split(F.col(text_col), " ")
    return (
        d.select(
            *extra,
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select(*extra, "p.w1", "p.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def _kn_stats(train: DataFrame, text_col: str):
    """The four Kneser-Ney statistic tables from a training corpus:
    ``(pairs, ctx, cont, total)`` = bigram counts c(w1,w2), context
    totals/fan-outs (c1, N1+(w1,.)), continuation fan-ins N1+(.,w2),
    and the scalar bigram-type count — shared by :func:`kn_bigram_lm`
    (estimation) and :func:`kn_doc_score` (inference)."""
    pairs = (
        _kn_bigrams(train, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_count"))
    )
    ctx = pairs.groupBy("w1").agg(
        F.sum("pair_count").alias("c1"), F.count("*").alias("n1_fwd")
    )
    cont = pairs.groupBy("w2").agg(F.count("*").alias("n1_bwd"))
    total = pairs.agg(F.count("*").alias("n_types"))
    return pairs, ctx, cont, total


def kn_bigram_lm(
    docs: DataFrame,
    discount: float = 0.75,
    top: int = 500,
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model estimation (Kneser
    & Ney 1995; Chen & Goodman 1999 eq. 4.25) — the KenLM-style model a
    quality-filtering pipeline trains on its own corpus:

    ``P_kn(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                    + (D · N1+(w1,·)/c(w1)) · N1+(·,w2)/N1+(··)``

    Scale shape: the corpus is touched once (adjacent-pair explode →
    one ``(w1, w2)`` count groupBy with map-side combine); every other
    statistic — context totals ``c(w1)``, continuation fan-outs
    ``N1+(w1,·)`` / ``N1+(·,w2)``, and the scalar bigram-type total —
    derives from that vocabulary²-bounded count table, never from the
    corpus again.  Two shuffles total at any corpus size.

    Every aggregate is an integer count, and the smoothing arithmetic
    is a fixed per-row expression tree over those integers (the 0.75
    discount is binary-exact), so ``p_kn`` is bit-identical in any
    IEEE engine — a trained LM whose estimation is hash-oracle-checked.
    Returns the ``top`` bigrams by count (ties broken on words):
    ``(w1, w2, pair_count, p_kn)``.
    """
    pairs, ctx, cont, total = _kn_stats(docs, text_col)
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("pair_count") - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("n1_fwd") / F.col("c1"))
        * (F.col("n1_bwd") / F.col("n_types"))
    )
    return (
        pairs.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "pair_count", p_kn.alias("p_kn"))
        .orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
        .limit(top)
    )


def hashed_classifier_score(
    docs: DataFrame,
    n_buckets: int = 256,
    bias: float = 0.0,
    weight_seed: str = "qw",
    bucket_seed: str = "qc|",
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """fastText-style hashed bag-of-words linear classifier INFERENCE —
    the learned-quality-gate shape (CCNet / fineweb-edu): each token
    hashes into one of ``n_buckets`` feature buckets, the document's
    logit is ``bias + mean(bucket weights)``, and ``passes`` gates on
    the logit (sigmoid is monotone, so thresholding the logit equals
    thresholding the probability — and skipping exp() keeps the operator
    engine-exact).

    The "model" is the deterministic weight table
    ``w(b) = (md5_long(weight_seed || b) % 2049 - 1024) / 1024`` —
    dyadic rationals (multiples of 1/1024), so every partial sum is
    EXACT in binary floating point and the aggregate is
    association-order-independent: the same number on any executor
    count, any engine, any reduction tree.  That is what lets a learned-
    classifier inference be hash-oracle-checked at all; swapping in a
    real trained weight table keeps the plan, only the literals change.

    Plan shape: token explode → md5 bucket + weight (codegen) → one
    map-side-combinable groupBy per doc.  At 100 TB each executor ships
    one (sum, count) partial per document — the same scan-and-fold
    scaling as every quality filter here.  Docs with no tokens produce
    no row (nothing to classify).
    """
    from .corpus import md5_bucket

    from .dedup import md5_long  # engine-portable 60-bit hash

    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).filter(F.col("t") != "")
    bucket = md5_bucket(F.col("t"), n_buckets, seed=bucket_seed)
    if weights is not None:
        # a TRAINED weight table (e.g. classifier_train) shipped as a
        # broadcast array literal — same plan, learned literals
        if len(weights) != n_buckets:
            raise ValueError(f"need {n_buckets} weights, got {len(weights)}")
        weight = F.array(*[F.lit(float(w)) for w in weights])[bucket]
    else:
        weight = (
            (md5_long(bucket.cast("string"), weight_seed) % 2049 - 1024).cast(
                "double"
            )
            / 1024.0
        )
    agg = tok.select(F.col(id_col), weight.alias("w")).groupBy(id_col).agg(
        F.sum("w").alias("_s"), F.count("*").alias("n_tokens")
    )
    logit = F.lit(bias) + F.col("_s") / F.col("n_tokens").cast("double")
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        logit.alias("logit"),
        (logit >= F.lit(threshold)).alias("passes"),
    )


# bpe_encode wraps every symbol in distinct START/END markers
# ("␞sym␟").  With full bracketing, adjacent merge-pattern occurrences
# share no characters, so one leftmost non-overlapping LITERAL replace
# per merge IS the classic greedy pairwise merge ("lllll" + (l,l) →
# ll,ll,l) — no lookahead regex needed, which is what makes the encoder
# expressible identically in engines whose regex lacks lookahead (RE2)
# and therefore hash-oracle-checkable.  (bpe_train's single-marker +
# Java-lookahead form is kept for the training loop where only Spark
# runs it.)
_BPE_L = "\x1e"  # symbol start (ASCII record separator)
_BPE_R = "\x1f"  # symbol end (ASCII unit separator)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a (pre)trained BPE merge table to a corpus — the inference
    half of :func:`bpe_train`, and the shape of "tokenize 100 TB with a
    frozen tokenizer": a pure map over documents, no shuffle, no UDF.

    Every non-space character is bracketed ``␞c␟``; each merge
    ``(a, b)`` rewrites the literal ``␞a␟␞b␟ → ␞ab␟`` over the whole
    document in rank order (word boundaries are the unbracketed spaces,
    which no pattern can cross).  Literal replacement is leftmost,
    non-overlapping, and left-to-right in every engine, and with full
    bracketing that equals the classical greedy pairwise merge — so the
    per-document token counts are engine-exact and oracle-checkable.

    Returns ``(id, n_chars, n_bpe_tokens, compression)`` where
    ``compression = n_chars / n_bpe_tokens`` (the tokenizer-quality
    metric a corpus pipeline tracks per source).  Documents of only
    spaces encode to 0 tokens; compression is NULL there.
    """
    # defensive: the marker bytes must never pre-exist in the text
    clean = F.replace(
        F.replace(F.col(text_col), F.lit(_BPE_L), F.lit("")),
        F.lit(_BPE_R),
        F.lit(""),
    )
    s = F.regexp_replace(clean, "([^ ])", _BPE_L + "$1" + _BPE_R)
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(_BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R),
            F.lit(_BPE_L + a + b + _BPE_R),
        )
    n_tokens = (
        F.length(s) - F.length(F.replace(s, F.lit(_BPE_L), F.lit("")))
    ).cast("long")
    n_chars = F.length(F.regexp_replace(clean, " ", "")).cast("long")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_bpe_tokens"),
        F.when(
            n_tokens > 0, n_chars.cast("double") / n_tokens.cast("double")
        ).alias("compression"),
    )


def tfidf_vectors(
    docs: DataFrame,
    vocab_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    weight: str = "ln",
) -> DataFrame:
    """Dense TF-IDF document vectors over the top-``vocab_size``
    document-frequency terms: ``(id, embedding array<double>)`` — the
    featurization that lets every embedding-side operator (k-means,
    SemDeDup, ANN, PQ) run on plain text corpora.

    The vocabulary (``vocab_size`` rows + one corpus-count scalar) is
    the only driver-side data — the same bounded-collect contract as
    k-means centroids; per-term ln(N/df) weights ship in the task
    closure as a literal map.  The corpus path is explode → (doc, term)
    count → map-literal lookup → one groupBy(doc) assembling the dense
    array.  Ties in the vocabulary cut break (df desc, term asc), so
    the feature space is deterministic.

    ``weight`` picks the IDF log: ``"ln"`` (default, libm — the
    quality path) or ``"mitchell"`` — ``plog2(N) − plog2(df)`` with
    Mitchell's piecewise-linear log2, every step exact or
    correctly-rounded IEEE, so the VECTORS replay bit-for-bit in any
    engine (the DSIR-scorer portability trade).  The mitchell form is
    what lets a clustering built on these vectors be hash-oracle-
    checked end to end (``doc_topic_clusters_refined``).
    """
    tok = docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = tok.filter(F.col("term") != "").groupBy(id_col, "term").agg(
        F.count("*").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    vocab = dfreq.orderBy(F.desc("df"), F.asc("term")).limit(vocab_size).collect()
    import math

    def _plog2(n: int) -> float:
        # Mitchell 1962: floor(log2 n) + (n / 2^floor(log2 n) - 1) —
        # the exact tree mitchell_plog2_sql/_duck_plog2 build, so the
        # driver-computed weight is bit-identical to the SQL twin's.
        f = n.bit_length() - 1
        return float(f) + (float(n) / float(1 << f) - 1.0)

    if weight == "mitchell":
        idx_w = {
            r["term"]: (i, _plog2(n_docs) - _plog2(r["df"]))
            for i, r in enumerate(vocab)
        }
    else:
        idx_w = {
            r["term"]: (i, math.log(n_docs / r["df"])) for i, r in enumerate(vocab)
        }
    idx_map = F.create_map(
        *[x for t, (i, _w) in idx_w.items() for x in (F.lit(t), F.lit(i))]
    )
    w_map = F.create_map(
        *[x for t, (_i, w) in idx_w.items() for x in (F.lit(t), F.lit(float(w)))]
    )
    entries = (
        tf.filter(F.col("term").isin(*idx_w))
        .select(
            id_col,
            idx_map[F.col("term")].alias("idx"),
            (F.col("tf") * w_map[F.col("term")]).alias("val"),
        )
    )
    dim = len(vocab)
    dense = (
        entries.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("idx", "val"))
            ).alias("_m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("_m", i), F.lit(0.0)),
            ).alias("embedding"),
        )
    )
    # documents with no vocabulary hits still get a (zero) vector
    return docs.select(id_col).distinct().join(dense, id_col, "left").select(
        id_col,
        F.coalesce(
            "embedding",
            F.array_repeat(F.lit(0.0), dim),
        ).alias("embedding"),
    )


def kn_doc_score(
    docs: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with a trained Kneser-Ney bigram LM — the
    inference half of :func:`kn_bigram_lm`, closing the CCNet-style
    loop (Wenzek et al. 2020): train an n-gram LM on a trusted slice,
    score the whole corpus with it, keep the well-modeled tail.

    The model is the full KN statistic table estimated from ``train``
    (defaults to ``docs`` — self-scoring, like quality-profiling a
    crawl against itself).  Each bigram occurrence in a scored document
    gets the interpolated-KN probability with discount D = 3/4:

    * pair seen in training:   ``p = (c-D)/c1 + (D·n1f/c1)·(n1b/N)``
    * pair unseen, context w1 seen: the backoff mass only,
      ``p = (D·n1f/c1)·(n1b/N)`` (``n1b = 0`` if w2 is also novel)
    * context unseen (OOV): not scorable — counted in ``n_oov``.

    Engine-portability is the whole design: with D = 3/4, scaling each
    probability by its denominator ``4·N·c1`` makes both numerator
    ``N·(4c-3) + 3·n1f·n1b`` and denominator INTEGERS, so the document
    score is a ratio of two exact BIGINT sums with ONE final IEEE
    division (the ``lm_support_score`` trick) — bit-identical in any
    engine, unlike a float log-prob sum whose combine order floats.
    ``kn_score`` is therefore the *context-frequency-weighted* mean of
    the per-bigram KN probabilities (weight 4·N·c1 — frequent contexts
    count more), monotone in model support exactly like an LM
    perplexity filter; swap the sums for ``Σ -log p`` only if a single
    blessed engine computes it.  (At extreme corpus sizes where
    ``4·N·Σc1`` nears 2^63, move both sums to DECIMAL(38,0).)

    Shape: the training corpus is touched once (the ``kn_bigram_lm``
    count tables, vocabulary²-bounded); the scored corpus is touched
    once (bigram explode) and joins the count tables on word keys —
    word-count-shaped shuffles, no window, no Python, no collect.
    """
    if train is None:
        train = docs
    pairs, ctx, cont, total = _kn_stats(train, text_col)

    scored = (
        _kn_bigrams(docs, text_col, id_col)
        .join(pairs, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(total))
    )
    backoff = F.lit(3) * F.col("n1_fwd") * F.coalesce(F.col("n1_bwd"), F.lit(0))
    num = F.when(F.col("c1").isNull(), F.lit(None).cast("long")).otherwise(
        F.when(
            F.col("pair_count").isNotNull(),
            F.col("n_types") * (F.lit(4) * F.col("pair_count") - F.lit(3)) + backoff,
        ).otherwise(backoff)
    )
    den = F.when(F.col("c1").isNull(), F.lit(None).cast("long")).otherwise(
        F.lit(4) * F.col("n_types") * F.col("c1")
    )
    return scored.select(id_col, num.alias("_num"), den.alias("_den")).groupBy(
        id_col
    ).agg(
        F.count("*").alias("n_bigrams"),
        F.count("_num").alias("n_scored"),
        (F.count("*") - F.count("_num")).alias("n_oov"),
        F.sum("_num").alias("kn_num"),
        F.sum("_den").alias("kn_den"),
        (
            F.sum("_num").cast("double") / F.sum("_den").cast("double")
        ).alias("kn_score"),
    )


def _grouped_global_rank(
    df: DataFrame,
    group_col: str,
    sort_col: str,
    id_col: str,
    n_ranges: int | None = None,
    descending: bool = True,
):
    """Two-phase distributed rank WITHIN each group — the shared
    machinery behind the per-language NTILE and the quantile trim:
    ``repartitionByRange`` on the (group, sort, id) total order, a
    staged checkpoint pinning ONE range assignment, per-(range, group)
    counts collected (≤ #ranges · #groups rows, the bounded-scalar
    class) into broadcast offsets.  Returns ``(ranged, off_map,
    totals)``: the staged frame with ``_pid``, the ``"group|pid" →
    offset`` literal map, and the per-group totals dict.  The caller
    adds its local row_number over ``Window.partitionBy("_pid",
    group)`` in the SAME sort order and derives its decision from
    ``offset + local_rank`` and ``totals`` — never a group-partitioned
    window over corpus rows (group cardinality is tiny; that window
    would sort each group's whole slice in one task)."""
    from .checkpoints import tracked_local_checkpoint

    if n_ranges is None:
        # Auto-scale the range count to the input's parallelism: a
        # fixed 8 means each (range, group) sort task owns ~1/8 of the
        # corpus at 100 TB.  The rank is exact for ANY range count
        # (offsets come from actual per-(pid, group) counts, not the
        # sampled boundaries), so this only changes task sizing — the
        # decision columns, and therefore the oracle hashes, are
        # invariant.
        n_ranges = max(8, df.rdd.getNumPartitions())
    sort_expr = F.desc(sort_col) if descending else F.asc(sort_col)
    ranged = df.repartitionByRange(
        n_ranges, F.asc(group_col), sort_expr, F.asc(id_col)
    ).withColumn("_pid", F.spark_partition_id())
    # the checkpoint pins ONE range assignment for both the size scan
    # and the rank pass; the returned frame roots on it, so its blocks
    # live exactly as long as the result (the build_corpus staging
    # discipline — swap for a staging-table write at 100 TB).
    ranged, _ = tracked_local_checkpoint(ranged)
    sizes = (
        ranged.groupBy("_pid", group_col)
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per_group: dict[str, list[tuple[int, int]]] = {}
    for r in sizes:
        if r[group_col] is None:
            # A NULL group would silently fall out of the broadcast
            # offset map (concat_ws drops NULL segments on the Spark
            # side while the Python f-string would render 'None'),
            # turning keep/bucket into NULL for those rows.  Fail
            # loudly instead: the caller must filter or fill the
            # group column before ranking.
            raise ValueError(
                f"_grouped_global_rank: NULL value in group column "
                f"{group_col!r}; filter or coalesce NULL groups first"
            )
        per_group.setdefault(r[group_col], []).append((r["_pid"], r["n"]))
    off_entries: list[tuple[str, int, int]] = []
    totals: dict[str, int] = {}
    for g, lst in per_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            off_entries.append((g, pid, acc))
            acc += cnt
        totals[g] = acc
    off_map = F.create_map(
        *[
            x
            for (g, pid, off) in off_entries
            for x in (F.lit(f"{g}|{pid}"), F.lit(off))
        ]
    )
    return ranged, off_map, totals


def quantile_trim(
    docs: DataFrame,
    score_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_ranges: int | None = None,
) -> DataFrame:
    """Percentile outlier trim WITHIN each group: drop the lowest
    ``lo_pct``% and the highest ``100-hi_pct``% of rows by
    ``score_col`` — the adaptive companion to Gopher's absolute
    bounds (a fixed min/max length rule breaks the moment the corpus
    mix shifts; rank cut-offs do not).  Cut counts are pure integers
    (``n·lo_pct // 100`` rows dropped at each end — no float
    percentile, no approx sketch), so the keep decision hash-replays
    exactly.

    Rank machinery is the shared :func:`_grouped_global_rank` (never a
    group-partitioned window).  Returns ``(id, group, score, keep)``
    for every input row.
    """
    base = docs.select(id_col, group_col, score_col)
    ranged, off_map, totals = _grouped_global_rank(
        base,
        group_col=group_col,
        sort_col=score_col,
        id_col=id_col,
        n_ranges=n_ranges,
        descending=False,
    )
    cuts = F.create_map(
        *[
            x
            for g, n in totals.items()
            for x in (
                F.lit(g),
                F.array(
                    F.lit(n * lo_pct // 100),
                    F.lit(n - n * (100 - hi_pct) // 100),
                ),
            )
        ]
    )
    key = F.concat_ws("|", F.col(group_col), F.col("_pid").cast("string"))
    w = Window.partitionBy("_pid", group_col).orderBy(
        F.asc(score_col), F.asc(id_col)
    )
    rn = (off_map[key] + F.row_number().over(w)).alias("_rn")
    c = cuts[F.col(group_col)]
    keep = (F.col("_rn") > c[0]) & (F.col("_rn") <= c[1])
    return ranged.select(id_col, group_col, score_col, rn).select(
        id_col, group_col, score_col, keep.alias("keep")
    )


def ccnet_perplexity_buckets(
    docs: DataFrame,
    train: DataFrame | None = None,
    n_buckets: int = 3,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_ranges: int | None = None,
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.3): score every document with the trained LM
    (:func:`kn_doc_score`), then split EACH LANGUAGE into
    ``n_buckets`` equal NTILE buckets by score — best-modeled docs
    (high ``kn_score`` ≈ low perplexity) in bucket 1 ("head").  CCNet
    ships head/middle/tail as the quality strata a consumer picks
    from; this is the per-language companion to the GLOBAL curriculum
    NTILE (``doc_curriculum_phases``) — same rank machinery, language-
    local quantiles, which is what makes the strata comparable across
    high- and low-resource languages.

    The per-language global rank is computed the DISTRIBUTED way, not
    with ``Window.partitionBy(lang)`` — language cardinality is tiny,
    so a lang-partitioned window plans each language's entire corpus
    slice into ONE task (the unpartitioned-window disease, sharded by
    ~30).  Instead: ``repartitionByRange`` on the (lang, score DESC,
    id) total order, per-(range, lang) local row_number, and the
    collected per-(range, lang) counts (≤ #ranges · #langs rows — the
    bounded-scalar collect class) as broadcast offsets; the NTILE
    bucket is then a closed-form expression over the per-lang rank and
    the per-lang totals (first ``n mod B`` buckets take the extra row,
    matching SQL NTILE exactly) — the ``doc_curriculum_phases``
    two-phase-rank shape, keyed by language.

    Docs the LM cannot score (every bigram context OOV) are excluded,
    as in the LM gate.  Returns ``(id, lang, kn_score, bucket)`` with
    ``bucket`` in 1..n_buckets.
    """
    scored = (
        kn_doc_score(docs, train=train, text_col=text_col, id_col=id_col)
        .filter(F.col("kn_score").isNotNull())
        .select(id_col, "kn_score")
        .join(docs.select(id_col, lang_col), id_col)
    )
    ranged, off_map, totals = _grouped_global_rank(
        scored,
        group_col=lang_col,
        sort_col="kn_score",
        id_col=id_col,
        n_ranges=n_ranges,
        descending=True,
    )
    # per-lang NTILE parameters as one literal map:
    # [big, div1, div2, r] with q = n // B, r = n % B,
    # big = r·(q+1) — SQL NTILE gives the first r buckets q+1 rows.
    B = n_buckets
    params = F.create_map(
        *[
            x
            for lang, n in totals.items()
            for x in (
                F.lit(lang),
                F.array(
                    F.lit((n % B) * (n // B + 1)),
                    F.lit(n // B + 1),
                    F.lit(max(n // B, 1)),
                    F.lit(n % B),
                ),
            )
        ]
    )
    key = F.concat_ws("|", F.col(lang_col), F.col("_pid").cast("string"))
    w = Window.partitionBy("_pid", lang_col).orderBy(
        F.desc("kn_score"), F.asc(id_col)
    )
    rn = (off_map[key] + F.row_number().over(w)).alias("_rn")
    p = params[F.col(lang_col)]
    big, div1, div2, rr = p[0], p[1], p[2], p[3]
    bucket = (
        F.when(F.col("_rn") <= big, F.ceil(F.col("_rn") / div1))
        .otherwise(rr + F.ceil((F.col("_rn") - big) / div2))
        .cast("int")
    )
    return ranged.select(id_col, lang_col, "kn_score", rn).select(
        id_col, lang_col, "kn_score", bucket.alias("bucket")
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int = 256,
    bucket_seed: str = "qc|",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean-pooled hashed bag-of-words features — the representation
    both :func:`hashed_classifier_score` (inference) and
    :func:`classifier_train` (training) consume: one row per
    ``(doc, bucket)`` with ``x = count_in_bucket / n_tokens``.

    One token explode + one (doc, bucket) groupBy; the output is at
    most ``min(n_tokens, n_buckets)`` rows per document, which is what
    lets a training loop iterate WITHOUT ever touching the corpus
    again."""
    from .corpus import md5_bucket

    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).filter(F.col("t") != "")
    counts = (
        tok.select(
            F.col(id_col), md5_bucket(F.col("t"), n_buckets, seed=bucket_seed).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(id_col)
    return counts.withColumn(
        "x", F.col("cnt").cast("double") / F.sum("cnt").over(w).cast("double")
    ).select(id_col, "bucket", "x")


def classifier_train(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = 256,
    iterations: int = 20,
    lr: float = 0.5,
    bucket_seed: str = "qc|",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[float], float, list[float]]:
    """Train the fastText-style hashed linear quality classifier by
    batch logistic-regression gradient descent — the TRAINING half of
    :func:`hashed_classifier_score` (CCNet / fineweb-edu train a gate
    like this on a labeled seed set, then score the whole crawl).

    Returns ``(weights, bias, losses)``: a dense ``n_buckets`` weight
    list, the bias, and the per-iteration mean log-loss (strictly
    decreasing on any non-degenerate set — pinned in pytest).

    Scale shape — the part that matters at 100 TB:

    * the corpus is touched ONCE: :func:`hashed_features` reduces it
      to a ``(doc, bucket, x)`` table (≤ min(tokens, buckets) rows per
      doc), staged via ``localCheckpoint`` so every iteration reads
      the compact features, never the text;
    * per iteration: the weight vector broadcasts as a literal array
      (n_buckets doubles), per-doc logits are one map-side-combinable
      groupBy over the feature table, per-bucket gradients one more
      (state ≤ n_buckets rows per partition), and the driver collects
      exactly ``n_buckets + 2`` numbers — bounded at any corpus size;
    * updates are diagonally preconditioned: each bucket's step is
      ``lr · g_b / Σ_docs x_b²`` (the one-time per-bucket curvature of
      the squared-error surrogate).  Mean-pooled features make a rare
      but decisive token's x tiny (1/n_tokens), so plain gradient
      steps crawl for exactly the features a quality gate needs; the
      preconditioner equalizes convergence across feature frequency
      (one extra bounded aggregate, computed once);
    * total cost ceiling (the iteration-serial driver loop, stated
      like :func:`bpe_train` states its batch floor): EXACTLY
      ``iterations`` Spark jobs — the bias gradient and the mean
      log-loss ride the per-bucket gradient aggregation as two
      sentinel buckets (-1/-2), so each iteration is ONE action over
      the checkpointed feature table and ONE driver collect of
      ``≤ n_buckets + 2`` rows.  With the default (256 buckets, 20
      iterations) that is 20 jobs and ~5 KB of driver traffic total,
      independent of corpus size; no corpus rescan ever.  The
      iterative float arithmetic is why the trainer is honestly
      rows-only while its inference twin is hash-oracle-checked.
    """
    import math

    from .checkpoints import tracked_local_checkpoint

    labels = docs.select(
        F.col(id_col), F.col(label_col).cast("double").alias("y")
    )
    feats = hashed_features(
        docs, n_buckets=n_buckets, bucket_seed=bucket_seed,
        text_col=text_col, id_col=id_col,
    ).join(labels, id_col)
    feats, _ = tracked_local_checkpoint(feats)
    n_docs = feats.select(id_col).distinct().count()
    # one-time diagonal preconditioner: per-bucket curvature Σ x²
    xx = {
        r["bucket"]: r["xx"]
        for r in feats.groupBy("bucket")
        .agg(F.sum(F.col("x") * F.col("x")).alias("xx"))
        .collect()
    }

    weights = [0.0] * n_buckets
    bias = 0.0
    losses: list[float] = []
    for _ in range(iterations):
        warr = F.array(*[F.lit(w) for w in weights])
        scored = (
            feats.withColumn("_wx", warr[F.col("bucket")] * F.col("x"))
            .groupBy(id_col, "y")
            .agg(F.sum("_wx").alias("_z"))
            .withColumn(
                "_p", F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + F.col("_z"))))
            )
            .withColumn("_r", F.col("_p") - F.col("y"))
            .withColumn(
                "_ll",
                -(
                    F.col("y") * F.log(F.greatest(F.col("_p"), F.lit(1e-12)))
                    + (F.lit(1.0) - F.col("y"))
                    * F.log(F.greatest(F.lit(1.0) - F.col("_p"), F.lit(1e-12)))
                ),
            )
        )
        # one action per iteration: bias gradient (-1) and log-loss
        # (-2) ride the bucket-gradient aggregation as sentinel rows.
        per_doc = scored.select(id_col, "_r", "_ll")
        grad_terms = (
            feats.join(per_doc.select(id_col, "_r"), id_col)
            .select("bucket", (F.col("_r") * F.col("x")).alias("_g"))
            .unionAll(
                per_doc.select(F.lit(-1).alias("bucket"), F.col("_r").alias("_g"))
            )
            .unionAll(
                per_doc.select(F.lit(-2).alias("bucket"), F.col("_ll").alias("_g"))
            )
        )
        grad_rows = {
            r["bucket"]: r["g"]
            for r in grad_terms.groupBy("bucket").agg(F.sum("_g").alias("g")).collect()
        }
        for b, g in grad_rows.items():
            if b >= 0:
                weights[b] -= lr * g / xx[b]
        bias -= lr * grad_rows.get(-1, 0.0) / n_docs
        losses.append(grad_rows.get(-2, 0.0) / n_docs)
    if math.isnan(bias):
        raise ValueError("divergence: lower lr")
    return weights, bias, losses


def compressibility(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compressibility — the Dolma-family quality
    signal the Column-expression scorers cannot express: machine-
    generated boilerplate, repeated templates, and gibberish all
    compress far outside natural prose's band (natural English at
    level 6 lands ~0.35–0.6; near-zero means pathological repetition,
    near-1 means high-entropy noise).  Returns ``(id, n_bytes,
    n_zlib, zlib_ratio)`` with ``zlib_ratio = n_zlib / n_bytes``
    (NULL for empty text).

    One Arrow-batched ``mapInPandas`` island: each batch's texts run
    through zlib's C deflate without per-row Python overhead beyond
    the call itself, and nothing returns to the driver.  Deterministic
    for a fixed zlib (pytest pins ordering between repetitive and
    natural fixtures plus run-to-run equality) but intentionally
    rows-only at the driver: DEFLATE output is library-defined, not
    replayable in ANSI SQL — the honest check strength for this
    signal.  Scale shape: a pure map stage; partitioning, pushdown,
    and column pruning are untouched.
    """
    import pandas as pd

    from ..shipping import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)

    out_id = id_col  # the output id column keeps the caller's name, so
    # compress_stats feeds gopher_quality_filter for any id_col

    def run(batches):
        import zlib

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["_id"].tolist(), pdf["_t"].tolist()):
                raw = (text or "").encode("utf-8")
                if not raw:
                    rows.append((doc_id, 0, 0, None))
                    continue
                n_z = len(zlib.compress(raw, level))
                rows.append((doc_id, len(raw), n_z, n_z / len(raw)))
            yield pd.DataFrame(
                rows, columns=[out_id, "n_bytes", "n_zlib", "zlib_ratio"]
            )

    return docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).mapInPandas(
        run,
        schema=f"{out_id} long, n_bytes long, n_zlib long, zlib_ratio double",
    )


def quality_gate_rocchio(
    docs: DataFrame,
    label_col: str = "label",
    n_buckets: int = 256,
    bucket_seed: str = "qc|",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Closed-form TRAINED quality gate — the hash-checkable member of
    the learned-gate family (:func:`classifier_train` keeps the
    iterative sigmoid-GD quality path; this is its ``_refined``-style
    twin, the quantized-Lloyd precedent applied to classification):
    the weight of hashed bucket ``b`` is the Rocchio / class-centroid
    difference of class-conditional token rates,

    ``w_b = floor((pos_b/P - neg_b/N) * 2^24 + 0.5)``

    (``pos_b``/``neg_b`` = tokens of positive/negative documents
    hashing to ``b``; ``P``/``N`` the class token totals), and a
    document's logit is the integer sum of its tokens' weights.  Every
    training statistic is an exact integer count, the one float step
    (two divisions, one multiply-add) is a fixed per-row expression
    tree — bit-identical in any IEEE engine — and the quantization
    bounds ``|w_b| <= 2^24`` at ANY corpus size, so logits stay exact
    BIGINTs however large the corpus grows (raw cross-multiplied
    integer weights would overflow int64 near 1e13 tokens).

    Returns one row per labeled document with tokens: ``(id, label,
    n_tokens, logit, passes)`` — the full trained-gate decision table
    under the hash.

    Degenerate input: a single-class corpus (``P == 0`` or ``N == 0``)
    has no discriminative direction, so this RAISES ``ValueError``
    rather than returning all-NULL decisions (the rate-difference
    divisions would go NULL and a downstream ``where(passes)`` gate —
    ``corpus_build_rocchio_gated`` — would silently deliver an EMPTY
    corpus).  Same loud-failure contract as ``_grouped_global_rank``'s
    NULL-group guard in this file: the class totals are a 1-row
    driver-side collect (the totals were already computed as the
    broadcast side of the weight expression; folding them in as
    literals costs no extra token pass and drops the crossJoin).

    Scale shape: two token-level corpus passes (train counts, score) —
    the same budget as the GD path's first iteration; training state
    is the ``n_buckets``-row weight table, broadcast to the scoring
    join; both groupBys are map-side combinable on the 8-byte bucket /
    the doc id."""
    from .corpus import md5_bucket

    tok = docs.select(
        F.col(id_col),
        F.col(label_col).cast("long").alias("_y"),
        F.explode(F.split(F.col(text_col), " ")).alias("_t"),
    ).filter(F.col("_t") != "")
    tok = tok.select(
        id_col, "_y", md5_bucket(F.col("_t"), n_buckets, seed=bucket_seed).alias("_b")
    )
    cls = tok.groupBy("_b").agg(
        F.sum("_y").alias("_pos_b"),
        F.sum(F.lit(1) - F.col("_y")).alias("_neg_b"),
    )
    tot = tok.agg(
        F.sum("_y").alias("_p"), F.sum(F.lit(1) - F.col("_y")).alias("_n")
    ).first()
    p_tot = int(tot["_p"] or 0)
    n_tot = int(tot["_n"] or 0)
    if p_tot == 0 or n_tot == 0:
        raise ValueError(
            f"quality_gate_rocchio: single-class seed (P={p_tot} "
            f"positive tokens, N={n_tot} negative tokens) has no "
            f"discriminative direction; provide both classes in "
            f"{label_col!r} or skip the gate"
        )
    w = cls.select(
        "_b",
        F.floor(
            (
                (F.col("_pos_b") / F.lit(p_tot))
                - (F.col("_neg_b") / F.lit(n_tot))
            )
            * F.lit(float(1 << 24))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("_w"),
    )
    scored = (
        tok.join(F.broadcast(w), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_w").cast("long").alias("logit"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )
    return scored.join(
        docs.select(id_col, F.col(label_col).cast("long").alias("label")),
        id_col,
    ).select(
        id_col,
        "label",
        "n_tokens",
        "logit",
        (F.col("logit") > 0).alias("passes"),
    )

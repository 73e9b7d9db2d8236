"""Paragraph-granularity dedup: CCNet keep-first and Dolma Bloom-gated.

Document-level dedup (exact / MinHash / SimHash / SemDeDup), span-level
(C4 :func:`.corpus.span_dedup`) and substring-level (ExactSubstr,
:func:`.corpus.substring_dedup`) all exist elsewhere in this package;
this module adds the remaining standard granularity of the published
training-data pipelines — the *paragraph* (CCNet removes duplicated
lines keeping the first occurrence, Wenzek et al. 2020 §4.1; Dolma
dedups paragraphs against a **Bloom filter** so the matching state is a
fixed bit array rather than a per-key table, Soldaini et al. 2024
§2.3).  The synthetic corpus has no newline structure, so — like
:func:`.corpus.span_dedup` — the paragraph unit is a fixed
non-overlapping ``para_words``-word window (the last window keeps the
tail).

Why the Bloom form matters at 100 TB: every incremental dedup variant
in this package keeps O(distinct-keys) state (hash tables of signatures
or window counts).  Dolma's answer is O(m bits) state regardless of
corpus size — the filter broadcasts to every executor and the probe is
map-side-only, at the price of a measured false-positive rate (novel
paragraphs falsely treated as duplicates; never the reverse — zero
false negatives is the Bloom guarantee).  Both the decision and its
exact-truth companion are pure md5 integer arithmetic
(:func:`.approx.bloom_build` / :func:`.approx.bloom_probe`), so every
bit is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .approx import bloom_build, bloom_probe
from .preprocess import chunk_tokens


def _segments(
    docs: DataFrame,
    para_words: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Non-overlapping ``para_words``-word paragraph segmentation:
    ``(doc_id, chunk_idx, chunk_text)`` — a codegen'd slice + explode
    (:func:`.preprocess.chunk_tokens`), no shuffle, no Python."""
    return chunk_tokens(
        docs.select(F.col(id_col).alias("doc_id"), text_col),
        chunk_size=para_words,
        overlap=0,
        text_col=text_col,
    ).select("doc_id", "chunk_idx", "chunk_text")


def _totals(
    docs: DataFrame, para_words: int, id_col: str, text_col: str
) -> DataFrame:
    """Per-document total paragraph count, computed from the text alone
    (so documents whose every paragraph was dropped still get a row)."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.ceil(F.size(toks) / F.lit(para_words)), F.lit(1))
        .cast("int")
        .alias("_n_paras"),
    )


def _reassemble(kept: DataFrame) -> DataFrame:
    """``(doc_id, chunk_idx, chunk_text)`` → ``(doc_id, clean_text,
    n_kept)``: surviving paragraphs back in document order.  The one
    corpus-byte shuffle, keyed by the id — skew bounded by document
    length, never by paragraph popularity."""
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "chunk_text"))
            ).alias("_a")
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("_a.chunk_text")).alias("clean_text"),
            F.size("_a").alias("n_kept"),
        )
    )


def paragraph_dedup_keepfirst(
    docs: DataFrame,
    para_words: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style paragraph dedup (Wenzek et al. 2020 §4.1): every
    repeated paragraph keeps exactly its FIRST occurrence — the one
    with the smallest ``(doc_id, chunk_idx)`` — and every later copy
    (across documents AND within one document) is removed.  The
    keep-one semantic is what distinguishes this from
    :func:`.corpus.span_dedup` (C4 removes shared spans from *all*
    documents, keeping no canonical copy).

    Returns ``(id, clean_text, n_paras_kept, n_paras_dropped)``;
    ``clean_text = ''`` when every paragraph of a document was a later
    copy.

    Scale shape (100 TB):

    * Segmentation is a codegen'd slice + explode — no shuffle.
    * First-occurrence detection groups on ``xxhash64(paragraph)`` and
      takes ``min(struct(doc_id, chunk_idx))`` — map-side combinable,
      so a boilerplate paragraph repeated a million times collapses to
      one row per map task BEFORE the shuffle (a window ``row_number``
      over the hash would funnel all million copies through one task).
    * The decision join back to segments keys on the same 8-byte hash;
      AQE's skew-join splitting applies if a hash is hot.
    * Reassembly shuffles corpus bytes once, keyed by the id.
    """
    seg = _segments(docs, para_words, id_col, text_col).withColumn(
        "_h", F.xxhash64("chunk_text")
    )
    first = seg.groupBy("_h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("_first")
    )
    kept = (
        seg.join(first, "_h")
        .where(
            (F.col("_first.doc_id") == F.col("doc_id"))
            & (F.col("_first.chunk_idx") == F.col("chunk_idx"))
        )
        .select("doc_id", "chunk_idx", "chunk_text")
    )
    out = _reassemble(kept)
    return (
        _totals(docs, para_words, id_col, text_col)
        .join(out, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_paras_kept"),
            (F.col("_n_paras") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_paras_dropped"
            ),
        )
    )


def paragraph_bloom_dedup(
    stored: DataFrame,
    batch: DataFrame,
    para_words: int = 12,
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: str = "pbloom|",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dolma-style Bloom paragraph dedup (Soldaini et al. 2024 §2.3):
    drop every paragraph of the incoming ``batch`` whose text is
    (Bloom-)already present in the ``stored`` corpus, and reassemble
    the batch documents from the survivors.  The matching state is the
    ``m_bits``-bit filter — constant-size however large the stored
    corpus grows — and the decision column is accompanied by the
    exact-truth count so the false-positive cost is *measured*, not
    assumed (the :func:`..registry.orders_bloom_prune` /
    ``dedup_lsh_eval`` discipline).

    Returns one row per batch document: ``(id, clean_text, n_paras,
    n_dropped_bloom, n_dropped_exact)``.  ``n_dropped_bloom >=
    n_dropped_exact`` always (zero false negatives); the difference is
    paragraphs falsely sacrificed to the filter.

    Sizing: ~16+ bits per distinct stored paragraph keeps the false
    positive rate ≈ ``(1 - e^(-k·n/m))^k`` below 1e-4 at ``k = 4``; the
    default ``m = 2^20`` covers ~65k distinct paragraphs at that rate
    and packs into 32k broadcastable words (128 KB).  A saturated
    filter fails soft (more paragraphs dropped) and visibly
    (``n_dropped_bloom`` diverging from ``n_dropped_exact``).

    Scale shape (100 TB stored corpus): the build is one segmentation
    pass + ``bit_or`` groupBy whose map-side combine collapses every
    partition to ≤ ``m/32`` rows before the shuffle; the probe side
    never shuffles (filter broadcast, per-paragraph bit tests local);
    the exact-truth companion joins distinct paragraph hashes — drop it
    in production and the stored corpus is never rescanned at all.
    """
    sseg = _segments(stored, para_words, id_col, text_col)
    sdist = sseg.select("chunk_text").distinct()
    bloom = bloom_build(sdist, "chunk_text", m_bits=m_bits, k=k, seed=seed)

    bseg = _segments(batch, para_words, id_col, text_col)
    bdist = bseg.select("chunk_text").distinct()
    probed = bloom_probe(
        bdist, bloom, "chunk_text", m_bits=m_bits, k=k, seed=seed
    )
    exact = (
        sdist.select(F.xxhash64("chunk_text").alias("_h"))
        .distinct()
        .withColumn("_stored", F.lit(True))
    )
    decided = (
        probed.withColumn("_h", F.xxhash64("chunk_text"))
        .join(exact, "_h", "left")
        .select(
            "chunk_text",
            F.col("bloom_member").alias("_drop_bloom"),
            F.coalesce("_stored", F.lit(False)).alias("_drop_exact"),
        )
    )
    marked = bseg.join(decided, "chunk_text")
    kept = marked.where(~F.col("_drop_bloom")).select(
        "doc_id", "chunk_idx", "chunk_text"
    )
    counts = marked.groupBy("doc_id").agg(
        F.sum(F.col("_drop_bloom").cast("int")).cast("int").alias("_nb"),
        F.sum(F.col("_drop_exact").cast("int")).cast("int").alias("_ne"),
    )
    out = _reassemble(kept)
    return (
        _totals(batch, para_words, id_col, text_col)
        .join(out, "doc_id", "left")
        .join(counts, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("_n_paras").alias("n_paras"),
            F.coalesce("_nb", F.lit(0)).alias("n_dropped_bloom"),
            F.coalesce("_ne", F.lit(0)).alias("n_dropped_exact"),
        )
    )


def _segments_with_group(
    docs: DataFrame,
    para_words: int,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`_segments` with a grouping column carried through the
    explode (``chunk_tokens`` projects it away): ``(doc_id, group,
    chunk_idx, chunk_text)``.  Same codegen'd slice-and-posexplode —
    no shuffle, no Python."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(para_words)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * para_words + 1, para_words), " "
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("_grp"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )


def boilerplate_profile(
    docs: DataFrame,
    para_words: int = 12,
    ratio_bp: int = 5000,
    min_docs: int = 3,
    min_report_docs: int = 2,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source repeated-line census — the detection half of
    RefinedWeb-style line-wise filtering (Penedo et al. 2023 §3.3:
    lines that recur across many documents of the same *source* are
    navigation menus / footers / cookie banners, not prose; CCNet
    applies the same document-frequency idea at the paragraph level).
    A line (``para_words``-word window — the corpus has no newline
    structure, the :func:`paragraph_dedup_keepfirst` convention) is
    **boilerplate** when it appears in ``>= ratio_bp`` basis points of
    its source's documents AND in ``>= min_docs`` documents — both
    sides exact integers, so the decision is engine-portable.

    Returns one row per (source, line) seen in ``>= min_report_docs``
    documents: ``(source, line_text, n_docs, src_docs, doc_ratio_bp,
    is_boiler)`` — the report a curation run reviews before committing
    the strip.

    Scale shape (100 TB): document-frequency is a two-phase count —
    ``(source, line, doc)`` distinct collapse, then ``(source, line)``
    count — both map-side combinable groupBys on the 8-byte
    ``xxhash64`` line key, so line TEXT never shuffles for counting (a
    text-keyed groupBy would move a corpus of distinct-line bytes
    through one exchange).  The report's text column resolves in a
    second map-side pass: segments broadcast-semi-filtered to the
    reported hashes — bounded by lines repeated ``min_report_docs``+
    times, the same boundedness the strip's decision table rests on —
    then one distinct over that filtered sliver.  Per-source totals
    are a |sources|-row aggregate joined by broadcast.  Nothing
    driver-side."""
    seg = _segments_with_group(
        docs, para_words, group_col, id_col, text_col
    ).withColumn("_h", F.xxhash64("_grp", "chunk_text"))
    reported = (
        seg.select("_grp", "doc_id", "_h")
        .distinct()
        .groupBy("_grp", "_h")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .where(F.col("n_docs") >= min_report_docs)
    )
    texts = (
        seg.join(F.broadcast(reported.select("_h")), "_h", "leftsemi")
        .select("_h", "_grp", "chunk_text")
        .distinct()
    )
    src_tot = docs.groupBy(F.col(group_col).alias("_grp")).agg(
        F.count("*").cast("bigint").alias("src_docs")
    )
    return (
        reported.join(texts, ["_h", "_grp"])
        .join(F.broadcast(src_tot), "_grp")
        .select(
            F.col("_grp").alias(group_col),
            F.col("chunk_text").alias("line_text"),
            "n_docs",
            "src_docs",
            (F.col("n_docs") * 10000 / F.col("src_docs"))
            .cast("double")
            .alias("doc_ratio_bp"),
            (
                (F.col("n_docs") * 10000 >= F.lit(ratio_bp) * F.col("src_docs"))
                & (F.col("n_docs") >= min_docs)
            ).alias("is_boiler"),
        )
    )


def boilerplate_strip(
    docs: DataFrame,
    para_words: int = 12,
    ratio_bp: int = 5000,
    min_docs: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RefinedWeb-style boilerplate-line removal (Penedo et al. 2023
    §3.3): drop every line whose source-level document frequency marks
    it boilerplate (the :func:`boilerplate_profile` rule), reassemble
    each document from the survivors.  Distinct from every dedup rung:
    :func:`paragraph_dedup_keepfirst` keeps ONE copy of a repeated
    line; the boilerplate rule keeps NONE — a footer on every page of
    a site is noise in all its occurrences, and keep-first would
    still train on it once per site.

    Returns ``(id, source, n_lines, n_kept, n_boiler_dropped,
    clean_text)``; ``clean_text = ''`` when a document was pure
    boilerplate.

    Scale shape (100 TB): the decision table from
    :func:`boilerplate_profile` is bounded by lines repeated across
    ``min_docs``+ documents — vastly smaller than the corpus — and
    joins back to segments on the 8-byte ``xxhash64(line)`` within
    source; AQE's skew-join splitting covers a hot footer hash.
    Reassembly shuffles corpus bytes once, keyed by the doc id (the
    :func:`_reassemble` shape — skew bounded by document length,
    never line popularity)."""
    df_per_line, src_tot = boilerplate_census(
        docs, para_words, group_col, id_col, text_col
    )
    return boilerplate_apply(
        docs,
        df_per_line,
        src_tot,
        para_words=para_words,
        ratio_bp=ratio_bp,
        min_docs=min_docs,
        group_col=group_col,
        id_col=id_col,
        text_col=text_col,
    )


def boilerplate_census(
    docs: DataFrame,
    para_words: int = 12,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The census half of the strip, exposed so it can ACCUMULATE:
    ``(line doc-frequency table (_grp, _h, _n_docs), per-source doc
    totals (_grp, _src_docs))``.  Both are plain additive counts, so
    per-batch censuses sum to the one-shot census regardless of how
    the corpus was batched — the property the streaming ingest's
    hash gate rests on (:func:`..streaming.ingest.
    replay_boilerplate_batches`)."""
    seg = _segments_with_group(
        docs, para_words, group_col, id_col, text_col
    ).withColumn("_h", F.xxhash64("_grp", "chunk_text"))
    df_per_line = (
        seg.select("_grp", "doc_id", "_h")
        .distinct()
        .groupBy("_grp", "_h")
        .agg(F.count("*").cast("bigint").alias("_n_docs"))
    )
    src_tot = docs.groupBy(F.col(group_col).alias("_grp")).agg(
        F.count("*").cast("bigint").alias("_src_docs")
    )
    return df_per_line, src_tot


def boilerplate_apply(
    docs: DataFrame,
    df_per_line: DataFrame,
    src_tot: DataFrame,
    para_words: int = 12,
    ratio_bp: int = 5000,
    min_docs: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the boilerplate decision given an (externally
    accumulated) census — the publish-time half of the two-phase
    deployment: the census accumulates while the corpus ingests, the
    strip runs once against the final counts.  ``df_per_line`` /
    ``src_tot`` must use :func:`boilerplate_census`'s schema (line
    keys are ``xxhash64(group, line)``).

    ACCEPTED COLLISION RISK: lines match on the bare 64-bit
    ``xxhash64(group, line)`` key with no text verify-back — the
    census table deliberately carries no line text (text never
    shuffles; that IS the scale design), so in the accumulate flow
    there is nothing to verify against.  A within-group collision
    between a boilerplate line and an innocent line would drop the
    innocent line corpus-wide.  Expected damage is ``B * L / 2**64``
    lines (``B`` = boilerplate lines above threshold — bounded small
    by construction; ``L`` = distinct lines in the group): at ``B =
    10**4`` and ``L = 10**9`` that is ~5e-7 lines, and the group key
    inside the hash confines any collision to one source.  If a
    deployment's ``B * L`` approaches ``2**64``, widen the census key
    to two independent 64-bit hashes (salt the second
    ``xxhash64(lit('bp2'), group, line)``) rather than shuffling
    text."""
    seg = _segments_with_group(
        docs, para_words, group_col, id_col, text_col
    ).withColumn("_h", F.xxhash64("_grp", "chunk_text"))
    boiler = (
        df_per_line.join(F.broadcast(src_tot), "_grp")
        .where(
            (F.col("_n_docs") * 10000 >= F.lit(ratio_bp) * F.col("_src_docs"))
            & (F.col("_n_docs") >= min_docs)
        )
        .select("_h", F.lit(True).alias("_boiler"))
    )
    marked = seg.join(boiler, "_h", "left")
    kept = marked.where(F.col("_boiler").isNull()).select(
        "doc_id", "chunk_idx", "chunk_text"
    )
    dropped = marked.groupBy("doc_id").agg(
        F.sum(F.coalesce(F.col("_boiler").cast("int"), F.lit(0)))
        .cast("int")
        .alias("_nb")
    )
    out = _reassemble(kept)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(group_col).alias(group_col)
        )
        .join(_totals(docs, para_words, id_col, text_col), "doc_id")
        .join(out, "doc_id", "left")
        .join(dropped, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            group_col,
            F.col("_n_paras").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("_nb", F.lit(0)).alias("n_boiler_dropped"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )

"""Training-sequence packing: documents → fixed-token-budget sequences.

Two packing disciplines a pretraining-data pipeline needs (north-star
surface; the reference has no analogue — its unit of work is one
document, lambda_function.py:785):

* :func:`pack_token_spans` — *concat-then-chunk* (GPT-style): documents
  are laid out in a deterministic global order, the concatenated token
  stream is cut every ``budget`` tokens, and a document contributes a
  span to every sequence its token range crosses.  Exactly expressible
  in SQL (the DuckDB oracle checks it), and the Spark plan is built for
  scale: the global running offset is a **two-level prefix sum** —
  per-bucket window cumsum + broadcast bucket offsets — never a
  single-partition window over the whole corpus.

* :func:`pack_greedy` — *first-fit, no document splitting* (T5-style):
  within a shard, walk documents in order and close a sequence when the
  next document would overflow the budget.  Inherently a sequential
  fold, so it runs as ``applyInPandas`` per shard — shards are the
  parallelism axis, state never leaves a shard.  Not SQL-expressible
  (rows-only check); invariants are pinned by property tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Documents per prefix-sum bucket.  Each bucket's cumsum is one window
# partition; bucket totals (corpus_docs / BUCKET_DOCS rows) are the only
# data that concentrates, and they stay far below broadcast size even at
# 10^10 documents.
BUCKET_DOCS = 100_000


def _token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )


def pack_token_spans(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_docs: int = BUCKET_DOCS,
    partition_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk packing; returns one row per (doc, sequence)
    span: ``doc_id, seq_id, tok_start, n_tokens``.

    ``tok_start`` is the document-relative offset of the span and
    ``n_tokens`` its length, so ``seq_id``'s spans always total exactly
    ``budget`` tokens (except the final sequence).

    ``partition_col`` packs each partition value as its OWN token
    stream (seq numbering restarts per partition; the output carries
    the column, so ``(partition_col, seq_id)`` is the sequence key).
    The motivating case is a train/val/test ``split`` column: packing
    a split-labeled corpus globally lets one 512-token sequence
    straddle a split boundary — train tokens physically inside an eval
    sequence, leakage the split stage existed to prevent.  Per-split
    packing makes cross-split sequences impossible BY CONSTRUCTION,
    not by filtering.

    Scale shape: one shuffle for the bucket window, one tiny aggregate
    (bucket totals) that re-enters as a broadcast join, one explode.
    The per-bucket window keys on ``doc_id div bucket_docs``, so no
    executor ever sees more than ``bucket_docs`` rows in one partition
    — the classic distributed prefix-sum, not a 1-partition sort.
    With ``partition_col`` both window keys gain the partition column
    (same shuffle count; the level-2 bucket table stays
    broadcastable at |partitions| × corpus/bucket_docs rows).
    """
    pcols = [partition_col] if partition_col is not None else []
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        *pcols,
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    bucket = (F.col("doc_id") / F.lit(bucket_docs)).cast("long")

    # Level 1: exclusive cumsum within each (partition, bucket).
    w = (
        Window.partitionBy(*pcols, "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn("bucket", bucket).withColumn(
        "local_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )

    # Level 2: per-bucket totals → exclusive cumsum over buckets within
    # each partition.  The bucket table is |partitions| ×
    # corpus_size/bucket_docs rows — broadcastable.
    wb = (
        Window.partitionBy(*pcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy(*pcols, "bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn("bucket_offset", F.coalesce(F.sum("bucket_total").over(wb), F.lit(0)))
        .select(*pcols, "bucket", "bucket_offset")
    )

    placed = local.join(F.broadcast(offsets), [*pcols, "bucket"]).withColumn(
        "start", F.col("bucket_offset") + F.col("local_start")
    )

    # A document spanning partition-local tokens [start, start+n)
    # intersects sequences floor(start/B) .. floor((start+n-1)/B).
    first_seq = F.expr(f"start div {budget}")
    last_seq = F.expr(f"(start + n_tokens - 1) div {budget}")
    seq = F.explode(F.sequence(first_seq, last_seq)).alias("seq_id")
    return placed.select("doc_id", *pcols, "n_tokens", "start", seq).select(
        "doc_id",
        *pcols,
        F.col("seq_id").cast("long").alias("seq_id"),
        (
            F.greatest(F.col("seq_id") * budget, F.col("start")) - F.col("start")
        ).cast("long").alias("tok_start"),
        (
            F.least((F.col("seq_id") + 1) * budget, F.col("start") + F.col("n_tokens"))
            - F.greatest(F.col("seq_id") * budget, F.col("start"))
        ).cast("long").alias("n_tokens"),
    )


def pack_greedy(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """First-fit packing without splitting: ``doc_id, shard, pack_id,
    n_tokens``.  Documents are routed to ``n_shards`` deterministic
    shards (``doc_id % n_shards``); inside a shard, documents are taken
    in ``doc_id`` order and a new pack opens when the running total
    would exceed ``budget``.  A single over-budget document gets a pack
    of its own (it must land somewhere; callers can filter or truncate).

    ``counts`` overrides the default whitespace token counter with a
    precomputed ``(doc_id, n_tokens)`` frame — the hook that lets the
    packing unit be REAL tokenizer tokens (compose with
    :func:`..operators.text_analysis.bpe_encode`) instead of words;
    training batches are budgeted in tokenizer tokens, not whitespace.

    The sequential fold state is one integer per shard, so the operator
    scales with shard count; at cluster scale set ``n_shards`` to a few
    × total cores.
    """
    import pandas as pd

    toks = (
        counts if counts is not None else _token_counts(docs, id_col, text_col)
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, pack_id, used = [], 0, 0
        for n in pdf["n_tokens"]:
            if used > 0 and used + n > budget:
                pack_id += 1
                used = 0
            used += int(n)
            pack_ids.append(pack_id)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return toks.groupBy("shard").applyInPandas(
        fold, schema="doc_id long, shard long, pack_id long, n_tokens long"
    )

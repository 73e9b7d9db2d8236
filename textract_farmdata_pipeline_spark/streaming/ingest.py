"""Streaming ingestion dedup: admit only novel documents, continuously.

The daily crawl-pipeline shape, streamed: each micro-batch is deduped
against the ACCUMULATED admitted corpus with
:func:`..operators.dedup.incremental_minhash_dedup` (corpus never
self-joins; both sides exact-collapse before LSH), and the batch's
novel documents are committed to the corpus before the next batch runs.

The corpus lives in a :class:`..operators.merge.ParquetMergeTable` and
each batch commits via keyed MERGE — so a micro-batch REPLAYED after a
failure re-upserts the same rows instead of duplicating them
(foreachBatch is at-least-once; the keyed merge is what makes the
pipeline effectively exactly-once).  Micro-batch boundaries are the
consistency points: batch N+1 sees exactly the corpus as of batch N.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_ingest_stream(
    docs: DataFrame,
    corpus_path: str,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    sink=None,
):
    """Returns a ``DataStreamWriter`` whose ``foreachBatch``:

    1. reads the admitted corpus (empty on the first batch),
    2. annotates the incoming batch with ``dup_of`` (smallest matching
       corpus doc, else smallest matching earlier batch doc, else NULL),
    3. MERGEs the novel rows (``dup_of IS NULL``) into the corpus table,
    4. calls ``sink(annotated_df, batch_id)`` with the (persisted)
       annotation DataFrame for observability / a rejects table.

    Start it with ``trigger(availableNow=True)`` in tests; the
    stream-equals-batch test pins that streaming admission in K batches
    equals one batch :func:`incremental_minhash_dedup` pass per batch
    prefix.
    """
    from ..operators.dedup import incremental_minhash_dedup
    from ..operators.merge import ParquetMergeTable

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        table = ParquetMergeTable(spark, corpus_path)
        if os.path.isdir(os.path.join(corpus_path, "_manifests")):
            corpus = table.read().select("doc_id", "text")
            exists = True
        else:
            corpus = spark.createDataFrame([], "doc_id long, text string")
            exists = False
        ann = incremental_minhash_dedup(
            corpus,
            batch_df.select("doc_id", "text"),
            n_hashes=n_hashes,
            bands=bands,
            threshold=threshold,
            shingle_n=shingle_n,
        ).persist()  # consumed twice (admission join + sink); batch-sized
        try:
            novel = batch_df.select("doc_id", "text").join(
                ann.filter(F.col("dup_of").isNull()).select("doc_id"), "doc_id"
            )
            if exists:
                table.merge(novel, key="doc_id")
            elif not novel.isEmpty():
                table.create(novel)
            if sink is not None:
                sink(ann, batch_id)
        finally:
            ann.unpersist()

    return docs.writeStream.foreachBatch(process)

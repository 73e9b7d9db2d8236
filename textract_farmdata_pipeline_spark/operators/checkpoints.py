"""Tracked localCheckpoint: eager checkpoint + explicit block release.

``DataFrame.localCheckpoint`` truncates lineage by persisting the
internal row RDD — but that RDD is not reachable from the Python
``DataFrame`` (``df.rdd``/``toRdd`` wrap it), so superseded per-round
checkpoints in iterative operators (connected components, PageRank)
linger in the block manager until the context cleaner's next GC-driven
sweep.  Across a long many-query session those orphans add up to real
executor-memory pressure (observed: a 500-doc clustering run degrading
8s → 128s late in a 30-query session).

The fix: diff ``SparkContext.getPersistentRDDs`` around the checkpoint
call to learn the new RDD's id, and unpersist it by id once the next
round's checkpoint has materialized.  The diff is not atomic — callers
are the session's serial iterative loops, not concurrent jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_ids(spark) -> set[int]:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().toList().iterator()
    out: set[int] = set()
    while it.hasNext():
        out.add(it.next()._1())
    return out


def tracked_local_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Eager localCheckpoint returning the checkpointed frame plus the
    block-manager RDD ids it created (pass to :func:`release`)."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    ck = df.localCheckpoint(eager=True)
    return ck, _persistent_ids(spark) - before


def release(spark, rdd_ids: set[int]) -> None:
    """Unpersist checkpoint blocks by id (non-blocking, idempotent).

    Only call on ids whose checkpoint has been superseded — a local
    checkpoint has no lineage to recompute from, so a released round
    must never be read again.
    """
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    for rid in rdd_ids:
        opt = jmap.get(rid)
        if opt.isDefined():
            opt.get().unpersist(False)

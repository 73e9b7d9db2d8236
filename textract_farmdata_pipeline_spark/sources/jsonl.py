"""JSONL (newline-delimited JSON) source + sink — the interchange
format LLM corpora actually ship in (Dolma, RedPajama, FineWeb, The
Pile all publish JSONL shards).

Scale rules baked in:

* **Reads require an explicit schema.**  Spark's JSON inference is a
  full extra pass over the data before the real job starts — at 100 TB
  that silently doubles the scan.  ``read_jsonl`` refuses to infer.
* **Malformed lines are a surface, not a crash.**  Web-scale corpora
  always contain a few truncated/overlong/invalid-escape lines; the
  default PERMISSIVE read captures them in a ``_corrupt_record``
  column so the pipeline can count/quarantine them (``FAILFAST`` is
  opt-in for trusted data).
* **Sharded writes are deterministic.**  ``n_shards`` repartitions by
  a hash of ``shard_col`` (not round-robin), so the same row lands in
  the same shard on every run — reruns overwrite byte-identically
  instead of reshuffling content across files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    multiline: bool = False,
) -> DataFrame:
    """Schema-pinned JSONL read.

    ``schema`` is a DDL string (``"doc_id long, text string"``) and is
    mandatory — pass what you expect, not what a sampling pass guesses.
    Under PERMISSIVE, rows that fail to parse land with every data
    column NULL and the raw line in ``corrupt_col`` (appended to the
    schema automatically; drop or filter it downstream).
    """
    if not schema or not str(schema).strip():
        raise ValueError(
            "read_jsonl requires an explicit schema: JSON inference is a "
            "full extra scan of the input"
        )
    reader = (
        spark.read.option("mode", mode)
        .option("multiLine", multiline)
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    full = schema
    if mode.upper() == "PERMISSIVE":
        # parse the DDL for real field names — a substring test would
        # let a column merely CONTAINING the corrupt-col name suppress
        # corrupt-record capture silently
        from pyspark.sql.types import StructType

        if corrupt_col not in StructType.fromDDL(schema).fieldNames():
            full = f"{schema}, {corrupt_col} string"
    return reader.schema(full).json(path)


def write_jsonl_shards(
    frame: DataFrame,
    path: str,
    shard_col: str | None = None,
    n_shards: int | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``frame`` as JSONL shard files under ``path``.

    With ``n_shards`` + ``shard_col``: repartition on
    ``xxhash64(shard_col)`` into exactly ``n_shards`` hash shards —
    deterministic placement (stable across reruns and cluster sizes),
    the layout a training data loader can address by shard index.
    Without them, the write keeps the frame's current partitioning
    (one file per task — the right default when upstream already
    sized partitions).  ``compression='gzip'`` for archival shards.
    """
    if (n_shards is None) != (shard_col is None):
        raise ValueError("pass n_shards and shard_col together, or neither")
    if n_shards is not None:
        if n_shards <= 0:
            raise ValueError(f"n_shards must be positive, got {n_shards}")
        frame = frame.repartition(n_shards, F.xxhash64(F.col(shard_col)))
    writer = frame.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)

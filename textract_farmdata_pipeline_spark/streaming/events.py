"""Event-stream operators: watermarked windows over the ``events`` table.

The reference has no event-time semantics (each file is processed when
its event arrives, late data impossible by construction — SURVEY §2.7);
these operators are the north-star streaming surface the driver's
``events`` table exercises.  Each builder takes *any* streaming or
batch DataFrame with ``(ts timestamp, user_id, event_type, value)`` —
the same plan compiles both ways, so the batch twins in the registry
(events_hourly / events_sessionize) are the oracle-checkable versions
of exactly these queries.

Watermark: 2 hours — bounds state for late data without dropping the
driver's generator jitter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_WATERMARK = "2 hours"

# With nanosAsLong the parquet's TIMESTAMP(NANOS) column reads as a
# raw-nanos long named ``ts``.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_windows(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Tumbling 1-hour event-time windows with a watermark.

    Streaming form of registry ``events_hourly``: same grouping, plus
    the watermark that lets the engine finalize and emit windows.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Streaming twin of registry ``events_sessionize`` (the batch
    gaps-and-islands formulation); ``session_window`` keeps one open
    session per user in state, merged/expired by the watermark.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sliding_windows(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding event-time windows (each event lands in size/slide wins)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "n_events")
    )


def _events_ts_is_nanos(spark: SparkSession, sf_dir: str) -> bool:
    """Sniff the events file's timestamp physical precision with a
    driver-side batch read (one footer).  The driver has shipped BOTH
    TIMESTAMP(NANOS) (arrives as bigint under ``nanosAsLong``) and
    µs-native files across rounds; assuming one of them silently
    corrupts event time by 1000× — caught when the session-replay
    ORACLE disagreed with a stream the stream-equals-batch test had
    been validating against an identically-wrong batch transform."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dict(probe.dtypes).get("ts") == "bigint"


def _derive_event_time(raw: DataFrame, is_nanos: bool) -> DataFrame:
    """Shared raw-int64 → µs TimestampType derivation for the batch
    fixture and the stream (ONE definition so they cannot be
    consistently-wrong together again)."""
    us = F.expr("ts_raw div 1000") if is_nanos else F.col("ts_raw")
    return (
        raw.withColumnRenamed("ts", "ts_raw")
        .withColumn("ts_us", us)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's events parquet as a bounded stream (availableNow
    backfill source).  The int64 timestamp is read raw (works for both
    NANOS-as-long and µs-native storage) and re-derived at µs after a
    precision sniff, matching registry._events."""
    is_ns = _events_ts_is_nanos(spark, sf_dir)
    path = f"{sf_dir}/events.parquet"
    # Hadoop-FS directory check, not os.path.isdir: sf_dir may be any
    # filesystem Spark can read (s3a://, hdfs://) and a local-only
    # check would silently fall into the glob branch and stream
    # nothing — the empty-stream failure mode all over again.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.getFileStatus(hpath).isDirectory():
        # Spark-written table: a DIRECTORY of part files — point the
        # file-stream source straight at it.  (The glob-filter form
        # below would match no files here and silently stream nothing
        # — caught when the ×10 probe ran "faster" than base on an
        # empty stream.)
        raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    else:
        # single-file layout: the file source wants a directory; glob
        # down to the one events file inside the sf dir
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return _derive_event_time(raw, is_ns)


def read_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`read_events_stream` with the identical
    event-time derivation — what stream-equals-batch tests must compare
    against (a separate hand-rolled transform is how a 1000× time
    error stayed invisible).

    Both readers force ``EVENTS_SCHEMA`` (ts as LongType): under
    ``nanosAsLong`` a TIMESTAMP(NANOS) column arrives as raw ns, and
    this Spark version also hands back a µs-native INT64 TIMESTAMP
    column as its raw µs long under the user schema — both pinned by
    the hash-green ``events_session_stream_replay`` oracle and the
    stream-equals-batch tests on the current (µs-native) fixtures."""
    is_ns = _events_ts_is_nanos(spark, sf_dir)
    raw = spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    return _derive_event_time(raw, is_ns)


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join.

    The static side is broadcast to every task of every micro-batch —
    no stream-side state, no watermark needed, and the static plan is
    re-resolved per batch so a refreshed dimension table (e.g. a
    reloaded Delta/parquet snapshot) is picked up without restarting
    the query.  The 100 TB/day pattern for attaching user / document /
    experiment metadata to an event firehose.
    """
    return events.join(F.broadcast(dim), on, how)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair each left event with right
    events for the same key within ``within`` *after* it.

    Both sides buffer state; the watermark plus the two-sided time
    bound lets the engine evict rows once no future match is possible
    — without the time bound the join state would grow forever, which
    is the difference between a demo and a pipeline.  The right side's
    columns must be pre-renamed (``r_``-prefixed) so the joined schema
    is unambiguous.

    ``how="left_outer"`` turns it into the funnel-with-dropouts shape:
    a left event with no partner inside the interval is still emitted
    (right columns null) — but only once the watermark has passed its
    join window, because until then a matching right event could still
    arrive.  Outer results are therefore delayed by the watermark; the
    eviction that bounds state is the same mechanism that releases the
    null rows.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)


def enrich_with_refreshing_dim(
    events: DataFrame,
    dim_loader,
    on: str = "user_id",
    how: str = "left",
    sink=None,
):
    """Broadcast-state enrichment with a per-batch-refreshed dimension.

    ``enrich_stream`` re-resolves a *static DataFrame's* files each
    batch, which covers append-only dims; this variant goes further:
    ``dim_loader()`` is invoked inside ``foreachBatch`` at the start of
    every micro-batch, so the dimension can be recomputed, re-read from
    a versioned snapshot (e.g. ``ParquetMergeTable.read()``), or pulled
    from a service — the streaming twin of Flink's broadcast-state
    pattern, done the Spark-idiomatic way (micro-batch boundaries are
    the consistency points; each batch sees exactly one dim version).

    ``sink(batch_out, batch_id)`` receives the enriched batch; pass
    e.g. a writer into a downstream table.  Returns the
    ``DataStreamWriter`` (caller starts it, so tests can use
    ``trigger(availableNow=True)``).
    """
    from pyspark.sql import functions as F  # local: keep module import light

    def process(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_loader()
        out = batch_df.join(F.broadcast(dim), on, how)
        sink(out, batch_id)

    return events.writeStream.foreachBatch(process)

"""Similarity search over embedding columns (north-star surface).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the approximate scale path.  All vector math is JVM-side
higher-order functions (``zip_with``/``aggregate``) over ``array<double>``
— no Python in the scoring loop; the query side is broadcast so scoring
is a map-only stage (no shuffle of the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (vec_id, embedding) is broadcast; the corpus streams
    through one map stage computing scores, then a per-query top-k via
    window rank.  At 100 TB the corpus never shuffles — only the
    (tiny) scored candidates move.  Self-matches are excluded.
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        ).withColumn("qnorm", norm(F.col("qv")))
    )
    # Norms are per-row, not per-pair: hoist them out of the O(n·q)
    # scoring loop.  The arithmetic shape dot/(qnorm·cnorm) is kept
    # bit-identical to the inline form (same fold, same sqrt).  The
    # repartition spreads a single-file corpus across all cores; at
    # cluster scale the source is already partitioned and this becomes
    # a cheap round-robin of vector rows (never a wide shuffle).
    c = (
        corpus.select(
            F.col("vec_id").alias("neighbor_id"), _as_double(F.col("embedding")).alias("cv")
        )
        .withColumn("cnorm", norm(F.col("cv")))
        .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    )
    score = dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def near_dup_pairs(vectors: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs above a cosine threshold (exact, O(n²) — baseline).

    For scale, gate with :func:`lsh_buckets` first so only same-bucket
    pairs are scored.
    """
    a = (
        vectors.select(F.col("vec_id").alias("id_a"), _as_double(F.col("embedding")).alias("va"))
        .withColumn("na", norm(F.col("va")))
        .repartition(vectors.sparkSession.sparkContext.defaultParallelism)
    )
    b = F.broadcast(
        vectors.select(F.col("vec_id").alias("id_b"), _as_double(F.col("embedding")).alias("vb"))
        .withColumn("nb", norm(F.col("vb")))
    )
    score = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def lsh_buckets(vectors: DataFrame, n_planes: int = 16, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Hyperplane components are deterministic md5-derived values in
    [-0.5, 0.5) — reproducible across runs/engines with no fitted
    state.  Bucket = sign-bit string of the n_planes projections.
    """
    planes = [
        F.array(
            *[
                (
                    F.conv(F.lit(format(_stable_hash(p, d), "x")), 16, 10).cast("double")
                    / F.lit(float(1 << 48))
                    - 0.5
                )
                for d in range(dim)
            ]
        )
        for p in range(n_planes)
    ]
    v = _as_double(F.col("embedding"))
    bits = [F.when(dot(v, plane) >= 0, F.lit("1")).otherwise(F.lit("0")) for plane in planes]
    return vectors.select("vec_id", F.concat(*bits).alias("bucket"))


def _stable_hash(plane: int, d: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:12], 16)


def ann_topk_lsh(
    corpus: DataFrame, queries: DataFrame, k: int = 5, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket candidates.

    The bucket join replaces the cross product — at scale this is the
    difference between O(n·q) and O(n·q/2^planes) scored pairs.
    """
    from pyspark.sql.window import Window

    cb = lsh_buckets(corpus, n_planes, dim).join(corpus, "vec_id")
    qb = lsh_buckets(queries, n_planes, dim).join(queries, "vec_id")
    c = cb.select(F.col("vec_id").alias("neighbor_id"), "bucket", _as_double(F.col("embedding")).alias("cv"))
    q = F.broadcast(
        qb.select(F.col("vec_id").alias("query_id"), "bucket", _as_double(F.col("embedding")).alias("qv"))
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )

"""Engine-portable approximate-membership and cardinality sketches.

Spark ships HyperLogLog++ (``approx_count_distinct``) and a Bloom
filter (``BloomFilterAggregate`` via the DataFrameStatFunctions /
runtime-filter machinery), but both are probabilistic *by
implementation*: register layout, hash family, and bias-correction
tables are engine-internal, so their outputs cannot be checked against
any other engine.  These twins rebuild the two classic sketches from
the repo's md5 hash family (``corpus.md5_bucket`` convention: leading
hex digits of ``md5(seed || key)``), making every register, bit, and
estimate bit-identical in DuckDB — the sketches themselves become
hash-oracle-checkable, the same promotion ``cms_sketch`` got for
count-min.

Scale shape (both): aggregation state is fixed-size (``m`` registers /
``m_bits/32`` words), so map-side partial aggregation collapses each
input partition to the sketch size before the shuffle — the defining
property that makes a sketch usable at 100 TB.

Portability notes baked into the math:

* HLL's harmonic-mean denominator sums ``2^-rho`` terms.  Each term is
  a dyadic rational and the exponent spread (``2^-33`` … register
  count) stays under the 53-bit double significand, so every partial
  sum is exact and the sum is order-independent — safe to hash-check
  even though it is a float aggregate.
* The DEFAULT estimate is the raw formula without the small-range
  linear-counting correction: the true correction needs ``ln``, whose
  last-ulp rounding is libm-specific (the repo's oracles avoid
  ``log``/``ln`` everywhere for this reason).  ``correction=True``
  now emits a PORTABLE correction anyway — ``m·ln(m/V)`` with the
  log2 computed by Mitchell's exact piecewise-linear approximation
  (:func:`.corpus.mitchell_plog2_sql`, no libm) and nats via a shared
  ``ln 2`` literal; it carries a documented ≤ 0.0861-bit (≈ 3.8
  counts at m=64) approximation bias, pinned in pytest alongside the
  accuracy bound, while exactness of every emitted column stays
  oracle-checked.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import md5_bucket

# alpha_m bias constants from Flajolet et al. 2007 (the HLL paper),
# exact decimal literals so both engines parse the identical double.
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    if m in _HLL_ALPHA:
        return _HLL_ALPHA[m]
    return 0.7213 / (1 + 1.079 / m)


def _hll_w(key: Column, seed: str) -> Column:
    """The 32-bit rho source: md5 hex digits 9-16 as an integer."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 9, 8), 16, 10
    ).cast("long")


def _rho32(w: Column) -> Column:
    """Position of the leftmost 1-bit of a 32-bit value (1-based), 33
    if the value is zero — computed as ``33 - bit_length`` via the
    binary-string length, which both Spark and DuckDB expose (``bin``)
    with identical no-leading-zeros semantics."""
    return F.when(w == 0, F.lit(33)).otherwise(33 - F.length(F.bin(w)))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    m: int = 64,
    seed: str = "hll|",
) -> DataFrame:
    """HyperLogLog register table: per group, ``(register, max_rho)``.

    One groupBy over ``(group, register)`` whose state is bounded by
    ``m`` rows per group — rows collapse map-side to at most
    ``|groups|·m`` regardless of input size, then a tiny shuffle.
    Register index and rho both derive from one md5 call per row
    (digits 1-8 → register via ``md5_bucket``, digits 9-16 → rho), so
    the two streams are independent uniform bits as HLL requires.
    """
    key = F.col(key_col)
    reg = md5_bucket(key, m, seed=seed)
    rho = _rho32(_hll_w(key, seed))
    return (
        df.select(*group_cols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


# repr(math.log(2)) — a shared decimal literal parses to the identical
# double in any engine, and multiplying by it is correctly rounded, so
# a log2-shaped quantity converts to nats with zero libm exposure.
_LN2 = 0.6931471805599453


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    m: int = 64,
    correction: bool = False,
) -> DataFrame:
    """Fold a register table into the raw HLL cardinality estimate.

    ``E_raw = alpha_m · m² / (Σ_present 2^-max_rho + n_empty·2^0)`` —
    absent registers (the table is sparse) contribute 1 each, exactly
    the classic formula.  Every emitted column is engine-exact: the
    dyadic-rational sum is order-independent (module docstring) and
    the final expression is one multiply-divide chain evaluated in a
    fixed order.

    ``correction=True`` adds the small-range linear-counting switch
    the module docstring historically had to leave to the caller
    ("needs ``ln``"): ``lc_estimate = m · ln(m/V)`` is now emitted
    PORTABLY by computing the log2 with Mitchell's exact
    piecewise-linear approximation
    (:func:`.corpus.mitchell_plog2_sql` — ``bin``-length + shift +
    correctly-rounded ops only) and converting to nats with the
    shared ``_LN2`` literal; ``hll_corrected`` applies the classic
    ``E_raw ≤ 2.5m AND V > 0`` switch.  The Mitchell log overshoots
    by ≤ 0.0861 bits, i.e. ≤ ``0.0861·ln2·m`` ≈ 3.8 counts at m=64 —
    bias pinned in pytest; exactness of every emitted column by the
    oracle.
    """
    alpha = _hll_alpha(m)
    est = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_used_registers"),
        (F.lit(m) - F.count("*")).alias("n_zero_registers"),
        (
            F.lit(alpha)
            * F.lit(float(m * m))
            / (
                F.sum(F.pow(F.lit(2.0), -F.col("max_rho")))
                + (F.lit(m) - F.count("*")).cast("double")
            )
        ).alias("hll_estimate"),
    )
    if not correction:
        return est
    from .corpus import mitchell_plog2_sql

    shift = "shiftleft({b}, {f})"
    lc = (
        f"((CAST({m} AS DOUBLE) * ({mitchell_plog2_sql(str(m), shift)}"
        f" - {mitchell_plog2_sql('n_zero_registers', shift)}))"
        f" * CAST({_LN2!r} AS DOUBLE))"
    )
    est = est.withColumn(
        "lc_estimate",
        F.expr(
            f"CASE WHEN n_zero_registers > 0 THEN {lc}"
            f" ELSE CAST(NULL AS DOUBLE) END"
        ),
    )
    return est.withColumn(
        "hll_corrected",
        F.expr(
            f"CASE WHEN n_zero_registers > 0 AND hll_estimate <="
            f" CAST({2.5 * m!r} AS DOUBLE)"
            f" THEN lc_estimate ELSE hll_estimate END"
        ),
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    m: int = 64,
    seed: str = "hll|",
    correction: bool = False,
) -> DataFrame:
    """``hll_registers`` → ``hll_estimate`` composed: the drop-in
    approximate COUNT(DISTINCT key) GROUP BY group_cols."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, m=m, seed=seed),
        group_cols,
        m=m,
        correction=correction,
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 4,
    seed: str = "bloom|",
) -> DataFrame:
    """Build a Bloom filter over a key set as ``m_bits/32`` packed
    words: ``(word_id, bits)``.

    Each key sets ``k`` bits (independent md5 seeds); bits pack 32 per
    word via ``bit_or`` (32, not 64: DuckDB's overflow-checked BIGINT
    ``<<`` rejects a shift into the sign bit, and the oracle must
    compute the identical words), whose state is at most ``m_bits/32``
    rows — map-side combine collapses any build-side size to the
    filter size before the shuffle.  The word table IS the filter:
    broadcast it and a 100 TB probe side filters locally without
    shuffling (the classic bloom-join pruning shape Spark itself uses
    for runtime row-group filtering).
    """
    positions = F.explode(
        F.array(
            *[md5_bucket(F.col(key_col), m_bits, seed=f"{seed}{i}|") for i in range(k)]
        )
    ).alias("pos")
    return (
        df.select(positions)
        .select(
            (F.col("pos") / 32).cast("long").alias("word_id"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 32).cast("int")
            ).alias("bit"),
        )
        .groupBy("word_id")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 4,
    seed: str = "bloom|",
) -> DataFrame:
    """Probe: a candidate is a (possible) member iff ALL ``k`` of its
    bits are set.  Adds ``bloom_member`` to ``candidates``.

    The filter broadcasts (≤ ``m_bits/32`` rows); each candidate LEFT-
    joins its ``k`` (word, bit) probes — an absent word means the bit
    is unset, so ``coalesce(bits, 0)``.  No shuffle of the probe side:
    broadcast join + per-key groupBy on a key the source already
    carries (map-side combinable count of hits).
    """
    key = F.col(key_col)
    probes = candidates.select(
        key_col,
        F.explode(
            F.array(
                *[md5_bucket(key, m_bits, seed=f"{seed}{i}|") for i in range(k)]
            )
        ).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / 32).cast("long").alias("word_id"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 32).cast("int")
        ).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_id", "left")
        .withColumn(
            "hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0).cast(
                "int"
            ),
        )
        .groupBy(key_col)
        .agg((F.sum("hit") == F.count("*")).alias("bloom_member"))
    )
    return candidates.join(hits, key_col, "left")


def bottomk_quantile_sketch(
    df: DataFrame,
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 512,
    seed: str = "qs|",
) -> DataFrame:
    """Deterministic bottom-k quantile sketch with built-in rank
    validation: estimate the nine deciles of ``value_col`` from the
    ``k`` rows with the smallest ``md5(seed || id)`` (a uniform sample
    independent of the value column, since the hash sees only the id),
    then measure each estimate's TRUE rank against the full table —
    ``(decile, est_value, n_le, rank_frac, rank_err)``.

    Unlike ``percentile_approx`` (whose GK-sketch internals are
    engine-specific), every step here is engine-exact: the sample is a
    deterministic distributed top-k (``orderBy().limit()`` — no global
    sort of the data), the decile index into the sorted sample is
    ``ceil(d·k/10)`` via floored exact-integer division, and the
    validation is nine broadcast thresholds counted against one scan
    (total-order tie-break on ``(value, id)``).  The sketch
    self-reports its error — ``rank_err`` ~ O(1/sqrt(k)) — instead of
    asking to be trusted.

    Scale shape: one TakeOrdered for the sample (k rows to the
    driver-side plan, never collected here), one window over k rows,
    one scan with a 9-row broadcast nested-loop count (bounded 9×
    multiplier), one scalar total.  State is k rows — mergeable the
    same way any bottom-k is (union → re-limit).
    """
    from .dedup import md5_long

    ev = df.select(
        F.col(id_col).alias("_id"), F.col(value_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    samp = (
        ev.withColumn("_b", md5_long(F.col("_id").cast("string"), seed))
        .orderBy(F.asc("_b"), F.asc("_id"))
        .limit(k)
        .select("_id", "_v")
    )
    from pyspark.sql.window import Window

    # k-row window: bounded by the sketch size, not the data
    ranked = samp.select(
        "_id",
        "_v",
        F.row_number().over(Window.orderBy(F.asc("_v"), F.asc("_id"))).alias("_r"),
        F.count("*").over(Window.partitionBy()).alias("_ns"),
    )
    decs = F.broadcast(
        ranked.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    )
    est = decs.join(
        ranked,
        F.col("_r")
        == F.floor(
            (F.col("decile") * F.col("_ns") + F.lit(9)) / F.lit(10.0)
        ).cast("long"),
    ).select(
        "decile",
        F.col("_v").alias("est_value"),
        F.col("_id").alias("est_id"),
    )
    n_le = (
        ev.join(
            F.broadcast(est),
            (F.col("_v") < F.col("est_value"))
            | ((F.col("_v") == F.col("est_value")) & (F.col("_id") <= F.col("est_id"))),
        )
        .groupBy("decile")
        .agg(F.count("*").alias("n_le"))
    )
    total = ev.agg(F.count("*").alias("_n"))
    rank_frac = F.col("n_le").cast("double") / F.col("_n").cast("double")
    return (
        est.join(n_le, "decile")
        .crossJoin(F.broadcast(total))  # 1-row scalar
        .select(
            "decile",
            "est_value",
            "n_le",
            rank_frac.alias("rank_frac"),
            F.abs(rank_frac - F.col("decile") / F.lit(10.0)).alias("rank_err"),
        )
    )

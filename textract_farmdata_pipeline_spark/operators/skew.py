"""Skewed-join salting: spread a hot key across reducers explicitly.

AQE's skew-join split (on in ``session.py``) handles most skew by
subdividing oversized partitions, but it only kicks in post-shuffle and
only for sort-merge joins.  Salting is the explicit form: the skewed
(large) side scatters each row into one of ``salt`` sub-keys, the other
side replicates into all of them, and the hot key's rows land on
``salt`` reducers instead of one.  Replication factor = ``salt`` on the
small side — size it as ceil(hot-key rows / healthy-partition rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the left (skewed, large) side salted and the right
    side replicated ×``salt``.

    Only ``inner``/``left``/``left_semi`` joins preserve semantics —
    an outer-right row would otherwise appear once per salt replica.
    Salt assignment hashes the whole left row (deterministic, and
    spreads even rows that are identical on the join key).
    """
    assert how in ("inner", "left", "left_semi"), "salting breaks right/outer semantics"
    on = list(on)
    spread = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", spread)
    r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "_salt", F.col("_salt").cast(l.schema["_salt"].dataType)
    )
    out = l.join(r, [*on, "_salt"], how)
    return out.drop("_salt")

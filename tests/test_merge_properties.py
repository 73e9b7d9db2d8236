"""Property-based check of MERGE semantics (SURVEY §5.4 style).

``merge_changes`` is one full-outer join plus classification columns;
these tests pin it against an independent pure-Python reference merge
over randomized target/source tables — keys overlapping or not, NULL
data values, delete conditions firing or not — so the Delta-default
semantics (source wins, delete beats update, unchanged suppressed)
hold by construction rather than by example.

Spark round-trips are ~1 s/example, so examples are few but each is a
whole randomized table pair; the seed-stable shrinker still minimizes
failures.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

value = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
# small key space forces overlaps; list-of-rows with unique keys
rows = st.dictionaries(st.integers(min_value=0, max_value=9), value, max_size=8)


def py_merge(target: dict, source: dict, delete_below: int | None):
    """Reference: Delta MERGE defaults on (k -> v) dicts."""
    snapshot = dict(target)
    changes = []
    for k, v in source.items():
        if k in target:
            if delete_below is not None and v is not None and v < delete_below:
                del snapshot[k]
                changes.append((k, target[k], "delete"))
            elif not (v == target[k]):  # None == None → unchanged
                snapshot[k] = v
                changes.append((k, target[k], "update_preimage"))
                changes.append((k, v, "update_postimage"))
        else:
            snapshot[k] = v
            changes.append((k, v, "insert"))
    return snapshot, sorted(changes, key=lambda t: (t[0], t[2]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=rows, source=rows, use_delete=st.booleans())
def test_merge_changes_matches_reference(spark, target, source, use_delete):
    from textract_farmdata_pipeline_spark.operators.merge import merge_changes

    schema = "k long, v long"
    t_df = spark.createDataFrame(list(target.items()) or [], schema)
    s_df = spark.createDataFrame(list(source.items()) or [], schema)
    delete_below = 0 if use_delete else None
    cond = (
        (F.col("s.v").isNotNull() & (F.col("s.v") < 0)) if use_delete else None
    )

    snap_df, chg_df = merge_changes(t_df, s_df, key="k", delete_condition=cond)
    got_snap = {r["k"]: r["v"] for r in snap_df.collect()}
    got_chg = sorted(
        ((r["k"], r["v"], r["_change_type"]) for r in chg_df.collect()),
        key=lambda t: (t[0], t[2]),
    )

    want_snap, want_chg = py_merge(target, source, delete_below)
    assert got_snap == want_snap
    assert got_chg == want_chg

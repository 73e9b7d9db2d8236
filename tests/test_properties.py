"""Property-based checks (SURVEY §5.4) over the pure-Python parser core.

No SparkSession needed — these pin invariants of the P1-P4 fold
helpers and the F5-F7 classifiers under arbitrary inputs, including
the documented reference invariants: every record has exactly 5 slots,
slots hold only digit-strings or the dash sentinel, filled slots are
never overwritten by a merge, and dash-only inputs stay dashes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from textract_farmdata_pipeline_spark.functions.parsing import (
    N_SLOTS,
    extract_continuation_values,
    merge_positional,
    parse_name_line,
)
from textract_farmdata_pipeline_spark.functions.predicates import (
    DASHES,
    py_is_continuation_line,
    py_is_numeric_token,
    py_starts_with_name,
)

text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters=",-—– $."
    ),
    max_size=80,
)

slot_value = st.one_of(
    st.just("-"), st.integers(min_value=0, max_value=999_999).map(str)
)
slots_strategy = st.lists(slot_value, min_size=N_SLOTS, max_size=N_SLOTS)
cont_strategy = st.lists(slot_value, min_size=0, max_size=8)


@settings(max_examples=300)
@given(text_strategy)
def test_parse_name_line_always_five_valid_slots(text):
    name, slots = parse_name_line(text)
    assert len(slots) == N_SLOTS
    for v in slots:
        assert v == "-" or v.isdigit()
    assert isinstance(name, str)


@settings(max_examples=300)
@given(text_strategy)
def test_extract_continuation_values_valid_tokens(text):
    for v in extract_continuation_values(text):
        assert v == "-" or v.replace(".", "").isdigit()


@settings(max_examples=300)
@given(slots_strategy, cont_strategy)
def test_merge_never_overwrites_filled_slots(base, cont):
    merged = merge_positional(list(base), list(cont))
    assert len(merged) == N_SLOTS
    for before, after in zip(base, merged):
        if before != "-":
            assert after == before  # filled slots are immutable
        assert after == "-" or after.replace(".", "").isdigit()


@settings(max_examples=300)
@given(slots_strategy, cont_strategy)
def test_merge_cursor_consumption(base, cont):
    """The cursor consumes one continuation value per dash slot, in
    order: the i-th dash slot gets cont[i] (unless cont[i] is itself a
    dash, which consumes but fills nothing)."""
    merged = merge_positional(list(base), list(cont))
    cursor = 0
    for i in range(N_SLOTS):
        if base[i] == "-" and cursor < len(cont):
            expect = cont[cursor] if cont[cursor] != "-" else "-"
            assert merged[i] == expect
            cursor += 1
        else:
            assert merged[i] == base[i]


@given(st.sampled_from(DASHES))
def test_dash_variants_are_numeric_tokens(dash):
    assert py_is_numeric_token(dash)


@settings(max_examples=300)
@given(text_strategy)
def test_continuation_implies_not_name(text):
    """F7 explicitly requires NOT F6 — the classifier flags are
    disjoint on any input (the fold's branch order depends on it)."""
    if py_is_continuation_line(text):
        assert not py_starts_with_name(text)


def test_dash_only_round_trip():
    """Reference-documented invariant: dashes stay dashes end-to-end
    (lambda_function.py:260, 746-756)."""
    name, slots = parse_name_line("John Smith, -, —, –, -, -")
    assert name == "John Smith"
    assert slots == ["-"] * N_SLOTS
    merged = merge_positional(slots, extract_continuation_values("-, —, –"))
    assert merged == ["-"] * N_SLOTS


class TestKeySkewProfile:
    def test_hand_computed_profile(self, spark):
        from textract_farmdata_pipeline_spark.operators.skew import key_skew_profile

        rows = [(k,) for k in ["a"] * 6 + ["b"] * 2 + ["c"] * 1 + ["d"] * 1]
        df = spark.createDataFrame(rows, "k string")
        out = key_skew_profile(df, key="k", top=2).collect()[0]
        assert out["n_keys"] == 4 and out["n_rows"] == 10
        assert out["max_group"] == 6
        # group sizes sorted: [1,1,2,6] -> p50 = 1.5 (exact interpolation)
        assert out["p50_group"] == 1.5
        assert out["skew_ratio"] == round(6 / (10 / 4), 4)
        assert out["top_keys"] == "a,b"

    def test_uniform_keys_ratio_one(self, spark):
        from textract_farmdata_pipeline_spark.operators.skew import key_skew_profile

        df = spark.createDataFrame([(i % 5,) for i in range(25)], "k long")
        out = key_skew_profile(df, key="k", top=3).collect()[0]
        assert out["skew_ratio"] == 1.0
        assert out["top_keys"] == "0,1,2"  # ties break by native key order

    def test_numeric_tie_break_is_native_not_string(self, spark):
        """Tied counts on numeric keys with different digit lengths must
        order numerically (9 before 41), matching both the top-k
        selection and a SQL oracle's ``ORDER BY n DESC, key ASC`` —
        a string-cast comparator would emit "41,9"."""
        from textract_farmdata_pipeline_spark.operators.skew import key_skew_profile

        rows = [(9,)] * 3 + [(41,)] * 3 + [(7,)] * 5
        df = spark.createDataFrame(rows, "k long")
        out = key_skew_profile(df, key="k", top=3).collect()[0]
        assert out["top_keys"] == "7,9,41"

"""End-to-end pipeline smoke + invariants on the sf0.001 fixture."""

from __future__ import annotations

import pytest

from textract_farmdata_pipeline_spark.fixtures import load_ocr_lines
from textract_farmdata_pipeline_spark.plans import run_pipeline


@pytest.fixture(scope="module")
def csv_frame(spark, sf_dir):
    blocks = load_ocr_lines(spark, sf_dir)
    df = run_pipeline(blocks, add_notes=True)
    df.cache()
    yield df
    df.unpersist()


def test_schema(csv_frame):
    assert csv_frame.columns == [
        "name",
        "alternate_name",
        "surname",
        "given_names",
        "suffix",
        "acres_improved",
        "acres_unimproved",
        "cash_value_farm",
        "value_implements",
        "value_livestock",
        "page",
        "page_line",
        "notes",
    ]


def test_rows_exist_and_names_nonempty(csv_frame):
    rows = csv_frame.collect()
    assert len(rows) > 100
    assert all(r["name"].strip() for r in rows)


def test_value_slots_are_digits_or_dash(csv_frame):
    from pyspark.sql import functions as F

    for column in (
        "acres_improved",
        "acres_unimproved",
        "cash_value_farm",
        "value_implements",
        "value_livestock",
    ):
        bad = csv_frame.filter(~F.col(column).rlike(r"^(\d+|\d+\.\d+|-)$")).count()
        assert bad == 0, f"non-digit, non-dash value in {column}"


def test_record_count_matches_name_lines(spark, sf_dir):
    """A1 invariant: one record per surviving non-empty-name line
    (empty-name records are dropped at flush)."""
    from pyspark.sql import functions as F

    from textract_farmdata_pipeline_spark.fixtures import load_ocr_lines
    from textract_farmdata_pipeline_spark.operators.layout import (
        classify_lines,
        prepare_blocks,
    )
    from textract_farmdata_pipeline_spark.plans import blocks_to_records

    blocks = load_ocr_lines(spark, sf_dir)
    lines = classify_lines(prepare_blocks(blocks))
    # Fixture name lines always parse to a non-empty name (the comma
    # always follows the name words), so counts must match exactly.
    expected = lines.filter(F.col("is_name") & ~F.col("is_cont")).count()
    got = blocks_to_records(blocks).count()
    assert got == expected


class TestAdaptiveThreshold:
    """G1 (reference dead code, lambda_function.py:96-131) as an
    optional mode: histogram gap-finding with degenerate fallbacks."""

    def test_degenerate_inputs_return_default(self, spark):
        from textract_farmdata_pipeline_spark.operators.layout import (
            DEFAULT_COLUMN_THRESHOLD,
            analyze_column_threshold,
        )

        few = spark.createDataFrame([(0.1 * i,) for i in range(5)], "left double")
        assert analyze_column_threshold(few) == DEFAULT_COLUMN_THRESHOLD
        narrow = spark.createDataFrame(
            [(0.40 + 0.00001 * i,) for i in range(50)], "left double"
        )
        assert analyze_column_threshold(narrow) == DEFAULT_COLUMN_THRESHOLD

    def test_finds_the_gap_between_columns(self, spark):
        from textract_farmdata_pipeline_spark.operators.layout import (
            analyze_column_threshold,
        )

        # two dense columns around 0.15 and 0.75, nothing between
        rows = [(0.10 + 0.001 * i,) for i in range(60)] + [
            (0.70 + 0.001 * i,) for i in range(60)
        ]
        got = analyze_column_threshold(spark.createDataFrame(rows, "left double"))
        assert 0.2 < got < 0.7

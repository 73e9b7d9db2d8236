"""SQL-surface registration (reference §2.8 — extensibility the
reference lacks).

The reference hard-codes all logic with zero user extensibility
(/root/reference/lambda_function.py:24-27 — four env vars).  Here every
parser/classifier is exposed twice:

* the Column builders in :mod:`.predicates` / :mod:`.names` — the fast
  JVM path used by the engine's own plans;
* this module's ``spark.udf.register`` bindings — so the same semantics
  compose in ad-hoc ``spark.sql`` queries:

      register_sql_functions(spark)
      spark.sql("SELECT * FROM lines WHERE starts_with_name(text)")

The UDF forms are the Python twins (row-at-a-time) — convenient, not
hot-path; plans that care about throughput use the Column forms.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .parsing import extract_continuation_values, merge_positional, parse_name_line
from .predicates import (
    py_is_continuation_line,
    py_is_header_text,
    py_is_numeric_token,
    py_starts_with_name,
)

_NAME_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("values", T.ArrayType(T.StringType())),
    ]
)


def register_sql_functions(spark: SparkSession) -> None:
    """Register the reference's operator surface as SQL functions."""
    spark.udf.register("is_header_text", py_is_header_text, T.BooleanType())
    spark.udf.register("is_numeric_token", py_is_numeric_token, T.BooleanType())
    spark.udf.register("starts_with_name", py_starts_with_name, T.BooleanType())
    spark.udf.register("is_continuation_line", py_is_continuation_line, T.BooleanType())
    spark.udf.register(
        "parse_name_line",
        lambda text: dict(zip(("name", "values"), parse_name_line(text or ""))),
        _NAME_PARSE_SCHEMA,
    )
    spark.udf.register(
        "extract_continuation_values",
        lambda text: extract_continuation_values(text or ""),
        T.ArrayType(T.StringType()),
    )
    spark.udf.register(
        "merge_positional",
        lambda base, cont: merge_positional(list(base or []), list(cont or [])),
        T.ArrayType(T.StringType()),
    )

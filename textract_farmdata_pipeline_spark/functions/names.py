"""Name decomposition (reference P5/P6) as pure Column expressions.

* P5 ``split_name``            — /root/reference/lambda_function.py:674-706
* P6 ``extract_alternate_name`` — /root/reference/lambda_function.py:711-715

Both are fully SQL-expressible: parenthetical removal, suffix lookup,
last-token surname.  No UDFs — everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Recognized generational suffixes (lambda_function.py:689), matched
# case-insensitively on the final token.
SUFFIXES: tuple[str, ...] = (
    "jr",
    "jr.",
    "sr",
    "sr.",
    "ii",
    "iii",
    "iv",
    "v",
    "2nd",
    "3rd",
    "4th",
    "5th",
)

_PAREN_RE = r"\([^)]+\)"


def alternate_name_col(name: Column) -> Column:
    """P6: first parenthesized group, trimmed; '' when absent."""
    return F.trim(F.regexp_extract(F.coalesce(name, F.lit("")), r"\(([^)]+)\)", 1))


def name_parts_cols(name: Column) -> tuple[Column, Column, Column]:
    """P5: return ``(surname, given_names, suffix)`` columns.

    Reference algorithm: drop parentheticals, whitespace-split; a single
    token is the surname; a trailing suffix token (from ``SUFFIXES``) is
    peeled; the last remaining token is the surname, the rest join as
    given names.
    """
    cleaned = F.trim(F.regexp_replace(F.coalesce(name, F.lit("")), _PAREN_RE, ""))
    norm = F.regexp_replace(cleaned, r"\s+", " ")
    parts = F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))
    n = F.size(parts)
    last = F.element_at(parts, -1)
    has_suffix = (n > 1) & F.lower(last).isin(*SUFFIXES)
    suffix = F.when(has_suffix, last).otherwise(F.lit(""))
    working = F.when(has_suffix, F.slice(parts, 1, n - 1)).otherwise(parts)
    m = F.size(working)
    surname = F.when(m >= 1, F.element_at(working, -1)).otherwise(F.lit(""))
    given = F.when(m > 1, F.array_join(F.slice(working, 1, m - 1), " ")).otherwise(F.lit(""))
    return surname, given, suffix

"""Deterministic synthetic OCR-line fixture, dialect-portable SQL.

Builds census-page-shaped line blocks (FIXTURES.md §1.1) from the
driver's ``lineitem`` table so that Spark queries and their DuckDB
oracles both derive *exactly* the same input without any side files.
The SQL restricts itself to the Spark∩DuckDB dialect (``||``, CASE,
split_part, CAST AS VARCHAR(n), FLOOR, %), verified to produce
bit-identical doubles and strings in both engines.

Line taxonomy by ``t = k % 10`` (k = l_orderkey*8 + l_linenumber, unique):

== =====================================================================
0  header line (stop-phrase, dropped by F4)
1  blank line (dropped by F3)
2  full record      ``Name, a1, a2, a3, a4, a5``
3  dash record      ``Name, -, a2, —, a4, –``  (all three dash variants)
4  single value     ``Name, a3``      (exercises the P2 heuristic)
5  bare continuation ``a3``
6  positional continuation ``-, a2, -``   (P4 cursor semantics)
7  name-only record  ``Name``
8  junk-prefixed     ``__ Name, a1, a2``
9  malformed line    ``see note a4 above xyz``  (mixed-content merge)
== =====================================================================

plus ``WORD``-typed blocks every 31st key (dropped by F1).  Names mix
initials, abbreviations (``Robt.``, ``Wm.``), parenthesized alternates
and generational suffixes — the reference's documented edge cases
(/root/reference/lambda_function.py:189-218, 689-697, 711-715).

Two CTE bodies are exported: ``ocr_features`` keeps the generator
variables visible (the oracles reconstruct expected parses from them);
``ocr_lines`` is the realistic block-table shape the pipeline consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

OCR_FEATURES_CTE_BODY = """
  SELECT *,
    CASE t
      WHEN 0 THEN 'Wayne County Agricultural Census 1860'
      WHEN 1 THEN '   '
      WHEN 2 THEN full_name || ', ' || a1 || ', ' || a2 || ', ' || a3 || ', ' || a4 || ', ' || a5
      WHEN 3 THEN full_name || ', -, ' || a2 || ', —, ' || a4 || ', –'
      WHEN 4 THEN full_name || ', ' || a3
      WHEN 5 THEN a3
      WHEN 6 THEN '-, ' || a2 || ', -'
      WHEN 7 THEN full_name
      WHEN 8 THEN '__ ' || full_name || ', ' || a1 || ', ' || a2
      ELSE 'see note ' || a4 || ' above xyz'
    END AS text
  FROM (
    SELECT
      k,
      CAST(FLOOR(k / 2400) AS BIGINT) AS doc_id,
      CAST(FLOOR((k % 2400) / 480) AS BIGINT) + 1 AS page,
      k % 10 AS t,
      CASE WHEN k % 31 = 0 THEN 'WORD' ELSE 'LINE' END AS block_type,
      CASE WHEN k % 2 = 0 THEN 0.1 ELSE 0.55 END
        + CAST(k * 3 % 10 AS DOUBLE) / 100.0 AS x_left,
      CAST(k % 480 AS DOUBLE) / 1500.0
        + CAST(k * 7 % 11 AS DOUBLE) / 2000.0 AS top,
      given_part, surname_part, alt_part, suffix_part,
      given_part || ' ' || surname_part
        || (CASE WHEN alt_part <> '' THEN ' (' || alt_part || ')' ELSE '' END)
        || (CASE WHEN suffix_part <> '' THEN ' ' || suffix_part ELSE '' END)
        AS full_name,
      a1, a2, a3, a4, a5
    FROM (
      SELECT
        k,
        CASE k % 8 WHEN 0 THEN 'John' WHEN 1 THEN 'A. B.' WHEN 2 THEN 'Robt.'
                   WHEN 3 THEN 'Mary Ann' WHEN 4 THEN 'Wm.' WHEN 5 THEN 'Seymour'
                   WHEN 6 THEN 'J.' ELSE 'Geo.' END AS given_part,
        CASE k % 9 WHEN 0 THEN 'Smith' WHEN 1 THEN 'Grady' WHEN 2 THEN 'Stemple'
                   WHEN 3 THEN 'McCoy' WHEN 4 THEN 'Vance' WHEN 5 THEN 'Hatfield'
                   WHEN 6 THEN 'Adkins' WHEN 7 THEN 'Ferrell' ELSE 'Oneal' END
          AS surname_part,
        CASE WHEN k % 19 = 0 THEN 'Johnny' ELSE '' END AS alt_part,
        CASE WHEN k % 13 = 0 THEN 'Jr.' WHEN k % 17 = 0 THEN 'Sr.' ELSE '' END
          AS suffix_part,
        CAST(k * 7 % 200 AS VARCHAR(20)) AS a1,
        CAST(k * 11 % 400 AS VARCHAR(20)) AS a2,
        CAST(k * 13 % 20000 AS VARCHAR(20)) AS a3,
        CAST(k * 3 % 500 AS VARCHAR(20)) AS a4,
        CAST(k * 5 % 900 AS VARCHAR(20)) AS a5
      FROM (
        -- DISTINCT: the synthetic lineitem has duplicate (orderkey,
        -- linenumber) pairs; a unique k makes every (top, seq) sort key
        -- a total order, so window tie-breaks are deterministic in both
        -- engines.
        SELECT DISTINCT l_orderkey * 8 + l_linenumber AS k FROM lineitem
      ) _keys
    ) _parts
  ) _named
"""

OCR_LINES_CTE_BODY = f"""
  SELECT k AS seq, doc_id, page, block_type, text,
    x_left, top, 0.1 AS width, 0.012 AS height
  FROM (
{OCR_FEATURES_CTE_BODY}
  ) _feat
"""

OCR_LINES_SQL = f"SELECT * FROM (\n{OCR_LINES_CTE_BODY}\n) ocr_lines"


def ocr_lines_cte(name: str = "ocr_lines") -> str:
    """``WITH``-clause fragment for embedding in oracle SQL."""
    return f"{name} AS (\n{OCR_LINES_CTE_BODY}\n)"


def ocr_features_cte(name: str = "ocr_features") -> str:
    """Generator-variable CTE (oracles reconstruct expected parses)."""
    return f"{name} AS (\n{OCR_FEATURES_CTE_BODY}\n)"


# One cached copy per (spark app, sf_dir): the fixture is the *input
# data* of every census query — a real deployment reads it from
# storage once, it doesn't re-synthesize 400k lines of SQL string
# concat per query (and Catalyst additionally duplicates the big CASE
# into filters it pushes below the dedup aggregate).
_cached: dict[tuple[str, str], DataFrame] = {}


def load_ocr_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the fixture as a DataFrame over ``{sf_dir}/lineitem``."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _cached:
        return _cached[key]
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    # ``left`` is a DuckDB reserved word, so the shared CTE emits
    # ``x_left``; the engine-facing DataFrame keeps the Textract name.
    df = spark.sql(OCR_LINES_SQL).withColumnRenamed("x_left", "left").cache()
    _cached[key] = df
    return df

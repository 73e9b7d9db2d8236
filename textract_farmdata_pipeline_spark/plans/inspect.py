"""Physical-plan inspection helpers.

Used by ``tools/plan_report.py`` (snapshot generation) and the
plan-shape regression tests: the cheapest guard that a code change
didn't silently turn a broadcast join into a sort-merge shuffle or
un-push a parquet filter — the regressions that are invisible at test
scale and catastrophic at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

from pyspark.sql import DataFrame

FEATURES = {
    "bhj": r"\bBroadcastHashJoin\b",
    "smj": r"\bSortMergeJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "python_eval": r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas",
}


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (PySpark only prints it)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Operator counts + pushdown flag from the static formatted plan.

    Static (pre-AQE) on purpose: it reflects what the written query
    *declares*; AQE can only improve on it at runtime.
    """
    text = plan_text(df)
    s = {k: len(re.findall(pat, text)) for k, pat in FEATURES.items()}
    # Each numbered operator appears in both the tree and the detail
    # section of the formatted output — count unique (id, name) pairs.
    ops = Counter(name for _, name in set(re.findall(r"\((\d+)\) (\w+)", text)))
    s["exchanges"] = ops.get("Exchange", 0)
    s["bhj"] = ops.get("BroadcastHashJoin", 0)
    s["smj"] = ops.get("SortMergeJoin", 0)
    s["shj"] = ops.get("ShuffledHashJoin", 0)
    s["bnlj"] = ops.get("BroadcastNestedLoopJoin", 0)
    s["python_eval"] = sum(
        ops.get(n, 0)
        for n in (
            "ArrowEvalPython",
            "BatchEvalPython",
            "FlatMapGroupsInPandas",
            "MapInPandas",
            "FlatMapCoGroupsInPandas",
            "PythonDataSource",
        )
    )
    s["pushed_filters"] = bool(re.search(r"PushedFilters: \[[^\]]", text))
    s["read_columns"] = sorted(
        set(
            c
            for m in re.findall(r"ReadSchema: struct<([^>]*)", text)
            for c in re.findall(r"(\w+):", m)
        )
    )
    return s

#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` and compares it
to its ``oracle_sql()`` DuckDB twin on the same parquet tables:
row count + column names/order-insensitive value hash.  Queries with no
oracle get a rows-only check (count > 0 and stable schema).

Usage: python tools/check_correctness.py [--sf DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def canonical(value) -> str:
    import datetime

    if value is None:
        return "<NULL>"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return repr(value)
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canonical(v) for v in value) + "]"
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def frame_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x01".join(canonical(row[i]) for i in order) for row in rows)
    digest = hashlib.sha256()
    for line in lines:
        digest.update(line.encode("utf-8", "replace"))
        digest.update(b"\n")
    return digest.hexdigest()[:16]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    parser.add_argument("--only", default=None)
    parser.add_argument(
        "--first", type=int, default=None,
        help="run only the first N queries in rotation order (the driver's per-round sample)",
    )
    parser.add_argument(
        "--json", default=None,
        help="write driver-format results (name -> {rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}) to this path",
    )
    args = parser.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from textract_farmdata_pipeline_spark.session import get_spark

    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs) if not args.only else args.only.split(",")
    if args.first is not None:
        names = names[: args.first]

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {exc}"[:300],
            }
            n_fail += 1
            continue

        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(s_rows), "oracle_rows": None,
                "err": "no_oracle",
            }
            n_pass += 1
            continue

        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(s_rows), "oracle_rows": None,
                "err": f"duckdb: {exc}"[:300],
            }
            n_fail += 1
            continue

        problems = []
        # Portability audit: DuckDB HUGEINT (SUM over BIGINT) degrades to
        # float64/object under pandas materialization on the driver side and
        # hash-mismatches Spark's int64 even when numerically equal.  Catch it
        # here: DESCRIBE the oracle and fail on HUGEINT-kind outputs, and on
        # int-vs-float kind drift against the Spark schema.
        try:
            desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            d_types = {r[0]: r[1] for r in desc}
            s_types = dict(sdf.dtypes)

            def kind(t: str) -> str:
                t = t.upper()
                if "HUGEINT" in t:
                    return "hugeint"
                if any(k in t.replace("BIGINT", "INT") for k in ("INT", "LONG", "SHORT", "BYTE")):
                    return "int"
                if any(k in t for k in ("DOUBLE", "FLOAT", "REAL")):
                    return "float"
                if "DECIMAL" in t:
                    return "decimal"
                return "other"

            for c, dt in d_types.items():
                if kind(dt) == "hugeint":
                    problems.append(f"oracle col {c} is HUGEINT ({dt}): cast to BIGINT/DOUBLE for driver portability")
                elif c in s_types and {kind(dt), kind(s_types[c])} == {"int", "float"}:
                    problems.append(f"type-kind drift on {c}: spark={s_types[c]} duck={dt}")
        except Exception:  # noqa: BLE001  pragma: no cover - DESCRIBE unsupported for some stmts
            pass
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows: spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs, hd = frame_hash(s_cols, s_rows), frame_hash(d_cols, d_rows)
            if hs != hd:
                problems.append(f"hash: spark={hs} duck={hd}")
                # show a sample diff
                ss = set(
                    "\x01".join(canonical(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i]))
                    for r in s_rows
                )
                dd = set(
                    "\x01".join(canonical(r[i]) for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i]))
                    for r in d_rows
                )
                only_s = list(ss - dd)[:2]
                only_d = list(dd - ss)[:2]
                for x in only_s:
                    problems.append(f"  spark-only: {x[:160]}")
                for x in only_d:
                    problems.append(f"  duck-only:  {x[:160]}")
        results[name] = {
            "rows_match": len(s_rows) == len(d_rows),
            "schema_match": sorted(s_cols) == sorted(d_cols),
            "hash_match": not problems,
            "spark_rows": len(s_rows),
            "oracle_rows": len(d_rows),
            "err": None,
        }
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    if args.json:
        import json as _json

        with open(args.json, "w") as fh:
            _json.dump(results, fh, indent=2)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

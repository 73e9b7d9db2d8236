#!/usr/bin/env python
"""One-command round preflight: everything the driver will measure,
run locally and written to committed artifacts.

Sequence (each step is the exact command the round is graded on):

1. ``pytest tests/ -q``                      → docs/preflight/pytest.txt
2. ``tools/check_correctness.py --first 50`` → docs/preflight/correctness.json
   (the driver samples the first 50 ``queries()`` entries in rotation
   order — this runs the identical prefix, so a clean preflight means
   a clean CORRECTNESS_r{N})
3. ``bench.py``                              → docs/preflight/bench.json

Exit code is non-zero if ANY step fails, so it gates a commit/ship.

Usage: python tools/preflight.py [--sf SF_CORRECTNESS] [--skip-pytest]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "preflight")


def run(cmd: list[str], log_path: str | None = None) -> int:
    print(f"\n=== {' '.join(cmd)}")
    proc = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    print(tail)
    if log_path:
        with open(log_path, "w") as fh:
            fh.write(proc.stdout)
            fh.write(proc.stderr)
    return proc.returncode


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf", default="/root/testdata/sf0.01")
    parser.add_argument("--skip-pytest", action="store_true")
    parser.add_argument(
        "--first", type=int, default=50,
        help="rotation-prefix size for the correctness gate (driver uses 50)",
    )
    args = parser.parse_args()
    os.makedirs(OUT, exist_ok=True)
    failures: list[str] = []
    t0 = time.time()

    if not args.skip_pytest:
        rc = run(
            [sys.executable, "-m", "pytest", "tests/", "-q"],
            os.path.join(OUT, "pytest.txt"),
        )
        if rc:
            failures.append("pytest")

    corr_json = os.path.join(OUT, "correctness.json")
    rc = run(
        [
            sys.executable, "tools/check_correctness.py",
            "--sf", args.sf,
            "--first", str(args.first),
            "--json", corr_json,
        ],
        os.path.join(OUT, "correctness.txt"),
    )
    if rc:
        failures.append("correctness")

    bench_log = os.path.join(OUT, "bench.txt")
    rc = run([sys.executable, "bench.py"], bench_log)
    if rc:
        failures.append("bench")
    else:
        # bench prints exactly one JSON line; persist it structured
        with open(bench_log) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        with open(os.path.join(OUT, "bench.json"), "w") as out:
                            json.dump(json.loads(line), out, indent=2)
                        break
                    except ValueError:
                        continue

    mins = (time.time() - t0) / 60
    if failures:
        print(f"\nPREFLIGHT FAILED ({', '.join(failures)}) in {mins:.1f} min")
        return 1
    print(f"\nPREFLIGHT CLEAN in {mins:.1f} min — artifacts in docs/preflight/")
    return 0


if __name__ == "__main__":
    sys.exit(main())

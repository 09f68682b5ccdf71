#!/usr/bin/env python
"""Per-query performance regression check against the PerfCatalog ledger.

Usage: python scripts/perf_regress.py [bench_json] [--sf 0.1] [--tol 1.3]

Compares a bench.py output line (default: runs bench.py fresh) against
the median historical timing per query in perf_ledger/ and flags
queries slower than ``tol`` × their median. Exit 1 if any regress —
wire into a round's close-out to catch per-query slowdowns that a
stable total would hide.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json", nargs="?", help="bench.py output line (file); default: run bench.py")
    ap.add_argument("--sf", default="0.1")
    ap.add_argument("--tol", type=float, default=1.3)
    args = ap.parse_args()

    if args.bench_json:
        line = open(args.bench_json).read().strip().splitlines()[-1]
    else:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
    bench = json.loads(line)

    from jasminegraph_spark.perf import PerfCatalog
    from jasminegraph_spark.session import get_spark

    spark = get_spark("perf-regress")
    ledger = PerfCatalog(spark, os.path.join(REPO, "perf_ledger"))
    if not os.path.exists(ledger.path):
        print("no ledger yet — run bench.py first; nothing to compare")
        return
    hist = {
        r["command"]: r["p50"]
        for r in ledger.history()
        .filter(f"name = 'sf{args.sf}'")
        .groupBy("command")
        .agg(__import__("pyspark.sql.functions", fromlist=["expr"]).expr(
            "percentile_approx(seconds, 0.5)").alias("p50"))
        .collect()
    }
    regressions = []
    for name, sec in bench["queries"].items():
        p50 = hist.get(name)
        if p50 is None or p50 <= 0:
            print(f"  new  {name}: {sec}s (no history)")
            continue
        ratio = sec / p50
        flag = "REGRESS" if ratio > args.tol else "ok"
        print(f"  {flag:7s} {name}: {sec}s vs p50 {p50:.2f}s ({ratio:.2f}x)")
        if ratio > args.tol:
            regressions.append(name)
    if regressions:
        print(f"\n{len(regressions)} regression(s): {regressions}")
        sys.exit(1)
    print("\nno per-query regressions")


if __name__ == "__main__":
    main()

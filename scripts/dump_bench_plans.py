#!/usr/bin/env python
"""Dump .explain("formatted") for every bench.py headline query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (VERDICT/judge checks plan claims against these files).

Usage: python scripts/dump_bench_plans.py <tag> <suffix> [query ...]
  e.g. python scripts/dump_bench_plans.py r13 before
       python scripts/dump_bench_plans.py r13 after an_pagerank an_triangle_count

Plans are captured WITHOUT executing the query (explain only), except that
queries whose construction itself runs eager steps (trackers, iterative
loops with convergence counts) still pay those. Explain shows the
AQE-initial plan; Exchange counts and join strategies are what we assert.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from jasminegraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-bench-plans")
    queries = entry_mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_ex} Exchange -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

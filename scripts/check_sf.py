#!/usr/bin/env python
"""Local driver-mirror correctness sweep at an arbitrary SF.

Usage: python scripts/check_sf.py [sf_dir] [query ...]
Runs each named query (default: all) against its DuckDB oracle with the
same compare the driver uses (tests/parity.py) and prints PASS/FAIL.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from parity import compare  # noqa: E402
from jasminegraph_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("check-sf")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if not names:
        names = list(queries)
    n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.perf_counter() - t0
        if name not in oracles:
            print(f"PASS {name} (rows-only, {len(spdf)} rows, {t_spark:.1f}s)")
            continue
        t0 = time.perf_counter()
        try:
            orpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        t_ora = time.perf_counter() - t0
        problems = compare(spdf, orpdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({t_spark:.1f}s/{t_ora:.1f}s):")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"PASS {name} ({len(spdf)} rows, {t_spark:.1f}s/{t_ora:.1f}s)")
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

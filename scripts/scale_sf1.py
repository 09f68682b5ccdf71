#!/usr/bin/env python
"""sf1-scale scaling datapoint (VERDICT r13 #6): run the five heavy graph
rows against a 10x lineitem (6M rows — ten disjoint key-shifted copies of
sf0.1, so the co-order graph is exactly 10x nodes and edges with per-copy
structure unchanged) at a given core count. The driver's 8-vs-32-core
block at sf0.1 is fixed-overhead-dominated; this is the same measurement
where parallelism is load-bearing.

Usage:
  python scripts/scale_sf1.py gen            # build /tmp/sf1_synth
  SPARK_GRAFT_CPUS=32 python scripts/scale_sf1.py run [names...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = "/tmp/sf1_synth"
HEAVY = [
    "an_pagerank",
    "an_connected_components",
    "an_link_prediction",
    "an_sage_sampled",
    "st_restart_replay",
]


def gen() -> None:
    from pyspark.sql import functions as F

    from jasminegraph_spark.session import get_spark

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    spark = get_spark("gen-sf1")
    src = "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    mo = li.agg(F.max("l_orderkey"), F.max("l_partkey"), F.max("l_suppkey")).collect()[0]
    maxo, maxp, maxs = mo[0] + 1, mo[1] + 1, mo[2] + 1
    big = None
    for i in range(10):
        part = (
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * maxo))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * maxp))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * maxs))
        )
        big = part if big is None else big.unionByName(part)
    big.repartition(32).write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")
    for t in (
        "region nation customer supplier part orders events documents embeddings"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{OUT}/{t}.parquet")
    print("rows:", get_spark("gen-sf1").read.parquet(f"{OUT}/lineitem.parquet").count())


def run(names) -> None:
    import __spark_entry__ as entry_mod
    from jasminegraph_spark.session import get_spark

    spark = get_spark("scale-sf1")
    queries = entry_mod.queries()
    for name in names or HEAVY:
        spark.sparkContext.setJobDescription(f"sf1:{name}")
        samples = []
        for _ in range(int(os.environ.get("SCALE_SF1_RUNS", "2"))):
            t0 = time.perf_counter()
            queries[name](spark, OUT).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: min={min(samples):.2f}s samples={[round(s, 2) for s in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "gen":
        gen()
    else:
        if args and args[0] == "run":
            args = args[1:]
        run(args)

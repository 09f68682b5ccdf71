#!/usr/bin/env python
"""Interleaved A/B for the sage_embeddings setup job (VERDICT r13 #4):

A (current): adj.repartition(v).persist(); adj.count()   -> 2 jobs/run
B:           adj.repartition(v).persist(); h0.persist(); h0.count()
             (one setup job materializes BOTH caches; the layer loop
             then starts from cached h0)
C:           no eager action at all (r13 measured the exchanges return
             — re-checked here for completeness)

Runs the FULL declared an_sage_embeddings row (plan construction +
noop sink + clearCache), alternating variants in one session.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from jasminegraph_spark.session import get_spark  # noqa: E402
from jasminegraph_spark.projection import co_order_edges  # noqa: E402
from jasminegraph_spark.analytics import linkpred as lp  # noqa: E402
from jasminegraph_spark.cache import finalize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "4"))


def sage_variant(spark, setup: str):
    und = co_order_edges(spark, SF_DIR).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    adj = (
        und.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionAll(und.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .repartition("v")
        .persist()
    )
    if setup == "A":
        adj.count()
    cur = lp._node_embeddings_from_adj(adj).persist()
    if setup == "B":
        cur.count()
    caches = [adj, cur]
    for k in range(1, 3):
        feats = [c for c in cur.columns if c != "v"]
        nbr = (
            adj.join(cur.select(F.col("v").alias("w"), *feats), "w")
            .groupBy("v")
            .agg(*[F.avg(c).alias(f"l{k}_{c}") for c in feats])
        )
        cur = cur.join(nbr, "v").persist()
        caches.append(cur)
    emb = finalize(cur, *caches)
    num = [c for c in emb.columns if c != "v"]
    return (
        emb.filter(F.col("v") <= 200)
        .select("v", *[F.round(c, 4).alias(c) for c in num])
        .orderBy("v")
    )


def main() -> None:
    spark = get_spark("ab-sage-setup")

    def run(setup: str) -> float:
        t0 = time.perf_counter()
        sage_variant(spark, setup).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    for s in ("A", "B", "C"):
        run(s)  # warmup
    res = {s: [] for s in ("A", "B", "C")}
    for _ in range(N):
        for s in ("A", "B", "C"):
            spark.sparkContext.setJobDescription(f"sage:{s}")
            res[s].append(run(s))
    for s, xs in res.items():
        print(f"{s}: min={min(xs):.3f} samples={[round(x,3) for x in xs]}")


if __name__ == "__main__":
    main()

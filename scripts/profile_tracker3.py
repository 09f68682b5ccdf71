#!/usr/bin/env python
"""Dump the physical plan of the tracker's batch-2 delta (state present)
plus per-stage shuffle volumes, to find the exchanges worth removing."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from jasminegraph_spark.session import get_spark  # noqa: E402
from jasminegraph_spark.projection import co_order_edges  # noqa: E402
from jasminegraph_spark.streaming import ingest as ing  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-tracker3")
    e = co_order_edges(spark, sf_dir).withColumn(
        "_h", F.substring(F.md5(F.concat_ws("|", "src", "dst")), 1, 1)
    ).persist()
    state_root = tempfile.mkdtemp(prefix="jgs_prof3_")
    state = f"{state_root}/edges"
    try:
        ctr = ing.StreamingTriangleCounter(spark, state)
        ctr.process_batch(e.filter(F.col("_h") < "4").select("src", "dst"), 1)
        # ---- batch 2, instrumented: rebuild the delta frame and explain it
        batch_edges = (
            e.filter((F.col("_h") >= "4") & (F.col("_h") < "8"))
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n_batch = batch_edges.count()
        new_c = ing.canonical_undirected(batch_edges).localCheckpoint(eager=False)
        batch_nbrs = ing._neighbor_arrays(new_c)
        merged = (
            ctr._nbrs.join(batch_nbrs.withColumnRenamed("zs", "zs_new"), "u", "full")
            .select(
                "u",
                F.when(F.col("zs").isNull(), F.col("zs_new"))
                .when(F.col("zs_new").isNull(), F.col("zs"))
                .otherwise(F.array_distinct(F.concat("zs", "zs_new")))
                .alias("zs"),
            )
        )
        nbrs = merged.localCheckpoint(eager=False)
        # replicate _delta_from_arrays but keep the frame for explain
        hint = F.broadcast
        nodes = (
            new_c.select(F.col("a").alias("u"))
            .unionAll(new_c.select(F.col("b").alias("u")))
            .distinct()
        )
        touched = nbrs.join(hint(nodes), "u", "semi")
        na = touched.select(F.col("u").alias("a"), F.col("zs").alias("za"))
        nb = touched.select(F.col("u").alias("b"), F.col("zs").alias("zb"))
        tri = (
            hint(new_c).join(na, "a")
            .join(nb, "b")
            .select("a", "b", F.explode(F.array_intersect("za", "zb")).alias("z"))
            .select(
                F.least("a", "b", "z").alias("t1"),
                F.expr("array_sort(array(a, b, z))[1]").alias("t2"),
                F.greatest("a", "b", "z").alias("t3"),
            )
            .distinct()
        )
        cnt = tri.count()
        print("delta:", cnt, "n_batch:", n_batch)
        print("=== EXECUTED PLAN (after AQE) ===")
        print(tri._jdf.queryExecution().executedPlan().toString()[:9000])
    finally:
        e.unpersist()
        shutil.rmtree(state_root, ignore_errors=True)


if __name__ == "__main__":
    main()

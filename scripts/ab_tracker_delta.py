#!/usr/bin/env python
"""Interleaved A/B of _delta_from_arrays variants on a fixed tracker state
(after 3 batches; arm runs the batch-4 delta). Arms:
  A: current shape (left-deep, broadcast-hinted batch, nodes dup'd)
  B: endpoint `nodes` computed once and pinned (kills the duplicated
     distinct subtree)
  C: B + `touched` pinned (one scan of the state arrays instead of two)
  D: measurement-only — A without the final triple distinct (multiplicity
     count; NOT semantics-preserving, quantifies the dedup exchange)
Each arm min-of-3, alternating. Same process, clearCache NOT used (state
pins are RDDs); inputs are identical pinned frames across arms.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from jasminegraph_spark.session import get_spark  # noqa: E402
from jasminegraph_spark.projection import co_order_edges  # noqa: E402
from jasminegraph_spark.streaming import ingest as ing  # noqa: E402


def tri_frame(nbrs, new_c, nodes=None, pin_touched=False):
    hint = F.broadcast
    if nodes is None:
        nodes = (
            new_c.select(F.col("a").alias("u"))
            .unionAll(new_c.select(F.col("b").alias("u")))
            .distinct()
        )
    touched = nbrs.join(hint(nodes), "u", "semi")
    if pin_touched:
        touched = touched.localCheckpoint(eager=False)
    na = touched.select(F.col("u").alias("a"), F.col("zs").alias("za"))
    nb = touched.select(F.col("u").alias("b"), F.col("zs").alias("zb"))
    return (
        hint(new_c).join(na, "a")
        .join(nb, "b")
        .select("a", "b", F.explode(F.array_intersect("za", "zb")).alias("z"))
        .select(
            F.least("a", "b", "z").alias("t1"),
            F.expr("array_sort(array(a, b, z))[1]").alias("t2"),
            F.greatest("a", "b", "z").alias("t3"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-tracker-delta")
    e = co_order_edges(spark, sf_dir).withColumn(
        "_h", F.substring(F.md5(F.concat_ws("|", "src", "dst")), 1, 1)
    ).persist()
    state_root = tempfile.mkdtemp(prefix="jgs_abdelta_")
    state = f"{state_root}/edges"
    try:
        ctr = ing.StreamingTriangleCounter(spark, state)
        for batch_no, (lo, hi) in enumerate(
            [(None, "4"), ("4", "8"), ("8", "c")], start=1
        ):
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("_h") >= lo)
            if hi is not None:
                cond = cond & (F.col("_h") < hi)
            ctr.process_batch(e.filter(cond).select("src", "dst"), batch_no)
        # fixed inputs for every arm: batch 4 pinned once, state arrays as-is
        batch = (
            e.filter(F.col("_h") >= "c").select("src", "dst").localCheckpoint(eager=False)
        )
        new_c = ing.canonical_undirected(batch).localCheckpoint(eager=False)
        new_c.count()  # materialize so arms measure only the delta
        nbrs = ctr._nbrs  # pinned merged arrays after batch 3
        nbrs.count()
        nodes_pinned = (
            new_c.select(F.col("a").alias("u"))
            .unionAll(new_c.select(F.col("b").alias("u")))
            .distinct()
            .localCheckpoint(eager=False)
        )

        def arm_a():
            return tri_frame(nbrs, new_c).distinct().count()

        def arm_b():
            return tri_frame(nbrs, new_c, nodes=nodes_pinned).distinct().count()

        def arm_c():
            return tri_frame(nbrs, new_c, nodes=nodes_pinned, pin_touched=True).distinct().count()

        def arm_d():
            return tri_frame(nbrs, new_c).count()

        arms = {"A-current": arm_a, "B-nodes1x": arm_b, "C-touch1x": arm_c, "D-nodedup": arm_d}
        results = {k: [] for k in arms}
        values = {}
        for i in range(n_pairs):
            for k, fn in arms.items():
                t0 = time.perf_counter()
                v = fn()
                results[k].append(time.perf_counter() - t0)
                values[k] = v
        for k, ts in results.items():
            print(f"{k}: min {min(ts):.2f}  all {[round(t,2) for t in ts]}  count={values[k]}")
    finally:
        e.unpersist()
        shutil.rmtree(state_root, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Phase-level timing inside StreamingTriangleCounter.process_batch:
replicates the batch loop with inline timers around (pin-count, delta,
parquet append, aggregate write). Warm run only (run 0 discarded)."""

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-tracker2")

    for it in range(3):
        spark.catalog.clearCache()
        e = co_order_edges(spark, sf_dir).withColumn(
            "_h", F.substring(F.md5(F.concat_ws("|", "src", "dst")), 1, 1)
        ).persist()
        state_root = tempfile.mkdtemp(prefix="jgs_prof2_")
        state = f"{state_root}/edges"
        try:
            ctr = ing.StreamingTriangleCounter(spark, state)
            for batch_no, (lo, hi) in enumerate(
                [(None, "4"), ("4", "8"), ("8", "c"), ("c", None)], start=1
            ):
                if batch_no == 3:
                    t0 = time.perf_counter()
                    del ctr
                    ctr = ing.StreamingTriangleCounter(spark, state)
                    print(f"  run {it} REBUILD: {time.perf_counter() - t0:5.2f}s")
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (F.col("_h") >= lo)
                if hi is not None:
                    cond = cond & (F.col("_h") < hi)
                batch_edges = e.filter(cond).select("src", "dst")
                # ---- inline process_batch with timers ----
                t0 = time.perf_counter()
                batch_edges = batch_edges.select("src", "dst").localCheckpoint(eager=False)
                n_batch = batch_edges.count()
                t1 = time.perf_counter()
                bcast_new = n_batch <= ctr.BROADCAST_BATCH_ROWS
                new_c = ing.canonical_undirected(batch_edges).localCheckpoint(eager=False)
                batch_nbrs = ing._neighbor_arrays(new_c)
                if ctr._nbrs is not None:
                    merged = (
                        ctr._nbrs.join(
                            batch_nbrs.withColumnRenamed("zs", "zs_new"), "u", "full"
                        )
                        .select(
                            "u",
                            F.when(F.col("zs").isNull(), F.col("zs_new"))
                            .when(F.col("zs_new").isNull(), F.col("zs"))
                            .otherwise(F.array_distinct(F.concat("zs", "zs_new")))
                            .alias("zs"),
                        )
                    )
                else:
                    merged = batch_nbrs
                prev = ctr._nbrs
                ctr._nbrs = merged.localCheckpoint(eager=False)
                delta = ing._delta_from_arrays(ctr._nbrs, new_c, bcast_new)
                t2 = time.perf_counter()
                ctr.total += delta
                if prev is not None:
                    prev.unpersist()
                batch_edges.write.mode("append").parquet(ctr.state_path)
                t3 = time.perf_counter()
                ctr._has_state = True
                ctr._n_rows += n_batch
                ing._write_aggregate(
                    ctr._agg_path, {"total": ctr.total, "n_edge_rows": ctr._n_rows}
                )
                t4 = time.perf_counter()
                print(
                    f"  run {it} batch {batch_no}: pin+count {t1-t0:5.2f}  "
                    f"delta {t2-t1:5.2f}  append {t3-t2:5.2f}  agg {t4-t3:5.2f}  "
                    f"n={n_batch} total={ctr.total}"
                )
        finally:
            e.unpersist()
            shutil.rmtree(state_root, ignore_errors=True)


if __name__ == "__main__":
    main()

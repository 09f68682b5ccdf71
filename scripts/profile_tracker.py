#!/usr/bin/env python
"""Per-batch phase/job profile of the StreamingTriangleCounter loop
(st_restart_replay machinery). Times each phase of process_batch and
counts Spark jobs per batch via job groups.

Usage: python scripts/profile_tracker.py [sf_dir]
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
from jasminegraph_spark.streaming.ingest import StreamingTriangleCounter  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-tracker")
    sc = spark.sparkContext

    def jobs_in_group(gid: str) -> int:
        return len(sc._jsc.sc().statusTracker().getJobIdsForGroup(gid))

    for it in range(3):
        spark.catalog.clearCache()
        t_run0 = time.perf_counter()
        e = co_order_edges(spark, sf_dir).withColumn(
            "_h", F.substring(F.md5(F.concat_ws("|", "src", "dst")), 1, 1)
        ).persist()
        state = tempfile.mkdtemp(prefix="jgs_prof_")
        try:
            ctr = StreamingTriangleCounter(spark, f"{state}/edges")
            for batch_no, (lo, hi) in enumerate(
                [(None, "4"), ("4", "8"), ("8", "c"), ("c", None)], start=1
            ):
                if batch_no == 3:
                    del ctr
                    ctr = StreamingTriangleCounter(spark, f"{state}/edges")
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (F.col("_h") >= lo)
                if hi is not None:
                    cond = cond & (F.col("_h") < hi)
                gid = f"it{it}-b{batch_no}"
                sc.setJobGroup(gid, gid)
                t0 = time.perf_counter()
                total = ctr.process_batch(e.filter(cond).select("src", "dst"), batch_no)
                dt = time.perf_counter() - t0
                print(
                    f"run {it} batch {batch_no}: {dt:6.2f}s  jobs={jobs_in_group(gid)}  total={total}"
                )
        finally:
            e.unpersist()
            shutil.rmtree(state, ignore_errors=True)
        print(f"run {it} TOTAL {time.perf_counter() - t_run0:6.2f}s")


if __name__ == "__main__":
    main()

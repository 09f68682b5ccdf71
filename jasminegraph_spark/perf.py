"""Performance/SLA bookkeeping — the reference's perfdb equivalent.

The reference records per-(graph, command, partition_count) latencies in a
SQLite perfdb and uses them for SLA-aware admission (ddl/perfdb.sql;
CypherQueryExecutor.cpp:164-189,366-376; JobScheduler.cpp:79-105 can
reject high-priority jobs whose SLA cannot be met). Here the same records
live in a parquet table and the admission check is a simple estimate
lookup — scheduling itself belongs to Spark/YARN/K8s.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PerfCatalog:
    spark: SparkSession
    path: str

    def record(self, name: str, command: str, partitions: int, seconds: float) -> None:
        df = self.spark.createDataFrame(
            [(name, command, partitions, float(seconds), float(time.time()))],
            "name string, command string, partitions int, seconds double, ts double",
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    @contextmanager
    def timed(self, name: str, command: str, partitions: int = 0):
        t0 = time.perf_counter()
        yield
        self.record(name, command, partitions, time.perf_counter() - t0)

    def history(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def estimate(self, name: str, command: str) -> float | None:
        """Median observed latency for (name, command) — the calibration
        value the reference's SLA admission compares against."""
        if not os.path.exists(self.path):
            return None
        rows = (
            self.history()
            .filter((F.col("name") == name) & (F.col("command") == command))
            .agg(F.expr("percentile_approx(seconds, 0.5)").alias("p50"))
            .collect()
        )
        return rows[0]["p50"] if rows and rows[0]["p50"] is not None else None

    def admits(self, name: str, command: str, sla_seconds: float) -> bool:
        """SLA admission: accept when unknown or estimated within the SLA
        (JobScheduler.cpp:79-93 semantics, minus the rejection queue)."""
        est = self.estimate(name, command)
        return est is None or est <= sla_seconds

#!/usr/bin/env python
"""Scale-stress the headline graph operators on a generated R-MAT graph.

The parquet test data tops out at sf0.1 (~10^5 graph edges); this script
measures the SAME operator code paths at 100-1000x that edge count using
the deterministic R-MAT generator (Graph500 shape: power-law hubs, the
adversarial degree distribution for wedge-style joins). Usage:

    python scripts/stress_scale.py [scale] [edge_factor]

Defaults: scale=21 (2M vertices), edge_factor=16 (32M generated edges).
Prints one JSON line per step so runs can be pasted into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from jasminegraph_spark.session import get_spark  # noqa: E402
from jasminegraph_spark.sources.generators import rmat_edges  # noqa: E402
from jasminegraph_spark.analytics.graph_algs import (  # noqa: E402
    pagerank,
    triangle_count_df,
)
from jasminegraph_spark.analytics.components import (  # noqa: E402
    connected_components_alternating,
    k_core,
)


def step(name: str, fn):
    t0 = time.perf_counter()
    out = fn()
    sec = round(time.perf_counter() - t0, 1)
    print(json.dumps({"step": name, "sec": sec, "result": out}), flush=True)
    return out


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    edge_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("stress-scale")
    path = f"/tmp/rmat_s{scale}_ef{edge_factor}.parquet"

    def gen():
        if not os.path.isdir(path):
            rmat_edges(spark, scale=scale, edge_factor=edge_factor).write.parquet(path)
        n = spark.read.parquet(path).count()
        return {"generated_edges": n}

    step(f"generate rmat scale={scale} ef={edge_factor}", gen)
    edges = spark.read.parquet(path)

    step(
        "wcc_alternating",
        lambda: {
            "components": connected_components_alternating(edges)
            .agg(F.countDistinct("component"))
            .collect()[0][0]
        },
    )
    step(
        "pagerank_10iter",
        lambda: {
            "top_rank": round(
                pagerank(edges, iterations=10)
                .agg(F.max("rank"))
                .collect()[0][0],
                6,
            )
        },
    )
    step(
        "k_core_k4",
        lambda: {"core_edges": k_core(edges, k=4).count()},
    )
    step(
        "triangle_count",
        lambda: {
            "triangles": triangle_count_df(edges).collect()[0][0]
        },
    )
    if os.environ.get("STRESS_KEEP") != "1":
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()

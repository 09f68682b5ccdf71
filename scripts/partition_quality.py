#!/usr/bin/env python
"""Partition-quality measurement vs the reference's METIS/Fennel/LDG
intent (r7, VERDICT r6 ask #7).

Runs HASH / LDG / Fennel / community (the METIS-role pipeline) at k=4
over (a) the reference's powergrid graph (4,941 nodes / 6,594 edges —
the graph MetisPartitioner is integration-tested on) and (b) an R-MAT
scale-16 power-law graph, and prints edge-cut + balance per method.
Results are recorded in SCALE.md §Partition quality; pytest floors live
in tests/test_streaming.py::test_partition_quality_report_powergrid.

Usage: python scripts/partition_quality.py [k] [rmat_scale] [edge_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jasminegraph_spark.session import get_spark  # noqa: E402
from jasminegraph_spark.sources.generators import rmat_edges  # noqa: E402
from jasminegraph_spark.sources.readers import read_edge_list  # noqa: E402
from jasminegraph_spark.streaming import (  # noqa: E402
    community_partition,
    fennel_partition,
    hash_partition,
    ldg_partition,
    metis_partition,
    partition_quality_report,
)

POWERGRID = "/root/reference/tests/integration/env_init/data/powergrid.dl"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ef = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("partition-quality")

    graphs = {}
    if os.path.exists(POWERGRID):
        graphs["powergrid"] = read_edge_list(
            spark, POWERGRID, "powergrid", is_directed=False
        ).edges.select("src", "dst")
    rm = rmat_edges(spark, scale=scale, edge_factor=ef).filter("src != dst")
    graphs[f"rmat_s{scale}_ef{ef}"] = rm.persist()

    methods = {
        "hash": hash_partition,
        "ldg": ldg_partition,
        "fennel": fennel_partition,
        "community": lambda e, kk: community_partition(e, kk, lp_iters=5),
        # the full METIS role (r10): best-of-seeds (community packing vs
        # id-range stripes, gpmetis's multiple-initial-partitions trick) +
        # KL/FM-style boundary-move refinement under the 1.05 balance cap
        "metis": metis_partition,
    }
    out = {}
    for gname, edges in graphs.items():
        edges = edges.persist()
        edges.count()
        out[gname] = {}
        for mname, fn in methods.items():
            t0 = time.perf_counter()
            rep = partition_quality_report(edges, fn(edges, k), k)
            rep["seconds"] = round(time.perf_counter() - t0, 2)
            rep["edge_cut"] = round(rep["edge_cut"], 4)
            rep["balance"] = round(rep["balance"], 3)
            out[gname][mname] = rep
            print(f"{gname:>16} {mname:>10} k={k}: {rep}", file=sys.stderr)
    print(json.dumps({"k": k, "results": out}))


if __name__ == "__main__":
    main()

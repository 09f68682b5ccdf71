#!/usr/bin/env python
"""External anchors for the METIS-role partition quality (r10, VERDICT
r9 ask #4).

No gpmetis binary or published per-graph METIS cut exists in-sandbox for
the reference's powergrid graph, so the anchor is twofold and honest:

1. **Computable-optimum anchor** — an n×n grid graph, k=4. The quadrant
   partition (four (n/2)×(n/2) blocks) cuts exactly 2n edges of the
   2n(n−1) total, i.e. cut fraction 1/(n−1); no balanced 4-way partition
   can beat the grid's bisection width n per bisecting line, so 2n is
   the optimum's cost up to lower-order terms. The ratio
   measured/optimal is the same "how close to METIS-grade" statement a
   gpmetis side-by-side would make, but reproducible from first
   principles in any environment.

2. **One-refine-round cost anchor** — a scale-S R-MAT graph (default 18,
   262k nodes) timing ONE `refine_partition` round against ONE
   LPA iteration (`community_partition(lp_iters=1)`), substantiating the
   "per-round cost is the cost class of one LPA iteration" claim in
   partitioners.py / SCALE.md with a measured datapoint.

Usage: python scripts/partition_anchor.py [grid_n] [rmat_scale]
Prints one JSON line; results are recorded in SCALE.md §Partition
quality and floored in tests/test_streaming.py::
test_grid_anchor_refine_close_to_computable_optimum (smaller grid).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jasminegraph_spark.session import get_spark  # noqa: E402
from jasminegraph_spark.sources.generators import rmat_edges  # noqa: E402
from jasminegraph_spark.streaming import (  # noqa: E402
    community_partition,
    edge_cut_fraction,
    metis_partition,
    range_partition,
    refine_partition,
)


def grid_edges(spark, n: int):
    """n×n 4-neighbor grid: node id = row·n + col; right + down edges."""
    cells = spark.range(n * n).select(
        (F.col("id") / n).cast("int").alias("r"),
        (F.col("id") % n).cast("int").alias("c"),
    )
    right = cells.filter(F.col("c") < n - 1).select(
        (F.col("r") * n + F.col("c")).alias("src"),
        (F.col("r") * n + F.col("c") + 1).alias("dst"),
    )
    down = cells.filter(F.col("r") < n - 1).select(
        (F.col("r") * n + F.col("c")).alias("src"),
        ((F.col("r") + 1) * n + F.col("c")).alias("dst"),
    )
    return right.unionAll(down)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    k = 4
    spark = get_spark("partition-anchor")
    out: dict = {"k": k}

    # 1. grid vs computable optimum — per-seed cuts + the full metis role
    g = grid_edges(spark, n).persist()
    n_edges = g.count()
    assert n_edges == 2 * n * (n - 1)
    seed_cuts = {
        "community": edge_cut_fraction(
            g, community_partition(g, k, lp_iters=5)
        ),
        "range": edge_cut_fraction(g, range_partition(g, k)),
    }
    t0 = time.perf_counter()
    cut = edge_cut_fraction(g, metis_partition(g, k))
    out["grid"] = {
        "n": n,
        "edges": n_edges,
        "seed_cuts": {s: round(c, 4) for s, c in seed_cuts.items()},
        "cut": round(cut, 4),
        "optimal_cut": round(1.0 / (n - 1), 4),
        "ratio_to_optimal": round(cut * (n - 1), 2),
        "seconds": round(time.perf_counter() - t0, 1),
    }
    print(f"grid {n}x{n}: {out['grid']}", file=sys.stderr)

    # 2. one refine round vs one LPA iteration at R-MAT scale
    rm = rmat_edges(spark, scale=scale, edge_factor=8).filter("src != dst").persist()
    rm.count()
    seed = community_partition(rm, k, lp_iters=5)
    seed.count()  # materialize: time the refine round, not the seeding
    t0 = time.perf_counter()
    refine_partition(rm, seed, k, max_rounds=1).count()
    t_refine = time.perf_counter() - t0
    t0 = time.perf_counter()
    community_partition(rm, k, lp_iters=1).count()
    t_lpa = time.perf_counter() - t0
    out["rmat"] = {
        "scale": scale,
        "edges": rm.count(),
        "one_refine_round_sec": round(t_refine, 1),
        "one_lpa_iter_sec": round(t_lpa, 1),
        "ratio": round(t_refine / max(t_lpa, 1e-9), 2),
    }
    print(f"rmat s{scale}: {out['rmat']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

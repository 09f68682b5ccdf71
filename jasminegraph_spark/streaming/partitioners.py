"""Streaming graph partitioners: HASH / Fennel / LDG (reference
partitioner/stream/Partitioner.cpp:28-226 — HASH :110-121, Fennel
:174-226, LDG :49-108).

In the reference the partitioner state lives on the *master* and every
edge passes through it sequentially (SURVEY §3.3), so the greedy
algorithms here run as one applyInPandas task over the edge stream in
arrival order — the same sequential semantics, executed in an executor
rather than the driver. HASH is the stateless scale path (a pure column
expression); Fennel/LDG exist for partition-quality parity and for
bootstrapping a better-than-hash layout that `GraphCatalog.save_bucketed`
can then materialize.

Quality metric: edge_cut_fraction — the share of edges whose endpoints
land in different partitions (what the reference's local/central split
minimizes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType(), False),
        T.StructField("pid", T.IntegerType(), False),
    ]
)


def hash_partition(edges: DataFrame, k: int) -> DataFrame:
    """HASH partitioner: pid = hash(node) % k (reference :110-121 uses
    stoi(id) % k; xxhash64 avoids numeric-id assumptions)."""
    nodes = (
        edges.select(F.col("src").cast("string").alias("node"))
        .union(edges.select(F.col("dst").cast("string")))
        .distinct()
    )
    return nodes.select("node", F.pmod(F.xxhash64("node"), F.lit(k)).cast("int").alias("pid"))


def _greedy(edges: DataFrame, k: int, scorer) -> DataFrame:
    """Shared sequential greedy pass (one executor task, stream order)."""
    e = edges.select(
        F.col("src").cast("string").alias("src"), F.col("dst").cast("string").alias("dst")
    ).withColumn("one", F.lit(1))

    def fn(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict[str, set] = {}
        assign: dict[str, int] = {}
        sizes = [0] * k
        n_est = max(len(pdf) * 2, 1)
        cap = n_est / k + 1
        for s, d in zip(pdf["src"], pdf["dst"]):
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
            for v in (s, d):
                if v in assign:
                    continue
                nbr_in = [0] * k
                for u in adj.get(v, ()):
                    p = assign.get(u)
                    if p is not None:
                        nbr_in[p] += 1
                best = max(range(k), key=lambda p: (scorer(nbr_in[p], sizes[p], cap, n_est, k), -sizes[p], -p))
                assign[v] = best
                sizes[best] += 1
        return pd.DataFrame({"node": list(assign), "pid": list(assign.values())})

    return e.groupBy("one").applyInPandas(lambda key, pdf: fn(key, pdf), ASSIGN_SCHEMA)


def ldg_partition(edges: DataFrame, k: int) -> DataFrame:
    """Linear Deterministic Greedy: place v where it has most neighbors,
    discounted by partition fullness (reference :49-108):
    score = |N(v) ∩ P_i| · (1 − |P_i|/C)."""
    return _greedy(edges, k, lambda nbrs, size, cap, n, kk: nbrs * (1.0 - size / cap))


def fennel_partition(edges: DataFrame, k: int, gamma: float = 1.5) -> DataFrame:
    """Fennel objective (reference :174-226): neighbors gained minus a
    superlinear load penalty: score = |N(v) ∩ P_i| − α·γ/2·|P_i|^(γ−1)."""

    def score(nbrs, size, cap, n, kk):
        alpha = (kk ** (gamma - 1.0)) * n / max(n ** gamma, 1)
        return nbrs - alpha * gamma / 2.0 * (size ** (gamma - 1.0))

    return _greedy(edges, k, score)


def edge_cut_fraction(edges: DataFrame, assignment: DataFrame) -> float:
    """Fraction of edges whose endpoints are in different partitions."""
    a = assignment.withColumnRenamed("node", "src").withColumnRenamed("pid", "pid_s")
    b = assignment.withColumnRenamed("node", "dst").withColumnRenamed("pid", "pid_d")
    e = edges.select(
        F.col("src").cast("string").alias("src"), F.col("dst").cast("string").alias("dst")
    )
    joined = e.join(a, "src").join(b, "dst")
    total = joined.count()
    if total == 0:
        return 0.0
    cut = joined.filter(F.col("pid_s") != F.col("pid_d")).count()
    return cut / total

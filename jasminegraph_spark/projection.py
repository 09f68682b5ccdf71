"""Project a property graph from the driver's TPC-H-ish tables.

The reference ingests property graphs from edge lists / JSON / RDF
(SURVEY §2.4); the driver's testdata is relational, so — per FIXTURES.md —
we project a graph from it: customers, suppliers, parts, orders, nations,
regions become labeled nodes; foreign keys become typed edges.

Two mirrored definitions live here:
  * :func:`tpch_graph` — the Spark DataFrame build (the engine's view).
  * :data:`TPCH_GRAPH_CTE` — the identical projection as an ANSI-SQL WITH
    clause, prepended to every DuckDB oracle query so the correctness gate
    compares graph-operator semantics, not projection plumbing.

Node ids are prefixed strings ('c:1', 'p:42', …) mirroring the reference's
string node ids (src/nativestore/NodeBlock.h:37). Properties are
map<string,string> (reference PropertyLink stores all values as strings,
src/nativestore/PropertyLink.h:24-29); doubles round-trip exactly through
Spark's shortest-repr cast, and oracle queries read the typed relational
columns directly, so outputs compare typed-to-typed.

Edge inventory (directed):
  PLACED      customer -> order       (prop totalprice)
  CONTAINS    order    -> part        (props quantity, extendedprice)
  SUPPLIES    supplier -> part        (distinct pairs from lineitem)
  LOCATED_IN  customer/supplier -> nation
  PART_OF     nation   -> region
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from jasminegraph_spark.graph import PropertyGraph
from jasminegraph_spark.session import load_tables


def _pm(**kv) -> "F.Column":
    """properties map from column expressions, all values cast to string.

    Built with CreateMap, not map_from_arrays (r14, guide §6/§2.3):
    Catalyst's SimplifyExtractValueOps folds GetMapValue(CreateMap(...),
    literal) down to the underlying column, so every property predicate /
    projection over this map collapses to the raw relational column — the
    per-row map construction disappears, unused property columns prune out
    of the parquet ReadSchema, and null-intolerant predicates regain their
    IsNotNull parquet pushdown. map_from_arrays is opaque to that rule
    (verified on Spark 4.1: the same filter keeps the full map build and
    reads every property column). The materialized map value is identical
    (same keys, same insertion order, same string casts)."""
    pairs: list = []
    for k, c in kv.items():
        pairs.append(F.lit(k))
        pairs.append(c.cast("string"))
    return F.create_map(*pairs)


def tpch_graph(spark: SparkSession, sf_dir: str, name: str = "tpch") -> PropertyGraph:
    t = load_tables(
        spark, sf_dir, ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    )
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    cid = F.concat(F.lit("c:"), s("c_custkey"))
    sid = F.concat(F.lit("s:"), s("s_suppkey"))
    pid = F.concat(F.lit("p:"), s("p_partkey"))
    oid = F.concat(F.lit("o:"), s("o_orderkey"))
    nid = F.concat(F.lit("n:"), s("n_nationkey"))
    rid = F.concat(F.lit("r:"), s("r_regionkey"))

    nodes = (
        t["customer"]
        .select(
            cid.alias("id"),
            F.lit("Customer").alias("label"),
            _pm(
                name=F.col("c_name"),
                mktsegment=F.col("c_mktsegment"),
                acctbal=F.col("c_acctbal"),
                nationkey=F.col("c_nationkey"),
            ).alias("properties"),
        )
        .unionByName(
            t["supplier"].select(
                sid.alias("id"),
                F.lit("Supplier").alias("label"),
                _pm(
                    name=F.col("s_name"),
                    acctbal=F.col("s_acctbal"),
                    nationkey=F.col("s_nationkey"),
                ).alias("properties"),
            )
        )
        .unionByName(
            t["part"].select(
                pid.alias("id"),
                F.lit("Part").alias("label"),
                _pm(
                    name=F.col("p_name"),
                    brand=F.col("p_brand"),
                    type=F.col("p_type"),
                    size=F.col("p_size"),
                    retailprice=F.col("p_retailprice"),
                ).alias("properties"),
            )
        )
        .unionByName(
            t["orders"].select(
                oid.alias("id"),
                F.lit("Order").alias("label"),
                _pm(
                    status=F.col("o_orderstatus"),
                    orderpriority=F.col("o_orderpriority"),
                    totalprice=F.col("o_totalprice"),
                ).alias("properties"),
            )
        )
        .unionByName(
            t["nation"].select(
                nid.alias("id"),
                F.lit("Nation").alias("label"),
                _pm(name=F.col("n_name")).alias("properties"),
            )
        )
        .unionByName(
            t["region"].select(
                rid.alias("id"),
                F.lit("Region").alias("label"),
                _pm(name=F.col("r_name")).alias("properties"),
            )
        )
    )

    li = t["lineitem"]
    edges = (
        t["orders"]
        .select(
            F.concat(F.lit("placed:"), s("o_orderkey")).alias("id"),
            F.concat(F.lit("c:"), s("o_custkey")).alias("src"),
            F.concat(F.lit("o:"), s("o_orderkey")).alias("dst"),
            F.lit("PLACED").alias("type"),
            _pm(totalprice=F.col("o_totalprice")).alias("properties"),
        )
        .unionByName(
            li.select(
                F.concat(F.lit("contains:"), s("l_orderkey"), F.lit(":"), s("l_linenumber")).alias(
                    "id"
                ),
                F.concat(F.lit("o:"), s("l_orderkey")).alias("src"),
                F.concat(F.lit("p:"), s("l_partkey")).alias("dst"),
                F.lit("CONTAINS").alias("type"),
                _pm(
                    quantity=F.col("l_quantity"), extendedprice=F.col("l_extendedprice")
                ).alias("properties"),
            )
        )
        .unionByName(
            li.select("l_suppkey", "l_partkey")
            .distinct()
            .select(
                F.concat(F.lit("supplies:"), s("l_suppkey"), F.lit(":"), s("l_partkey")).alias(
                    "id"
                ),
                F.concat(F.lit("s:"), s("l_suppkey")).alias("src"),
                F.concat(F.lit("p:"), s("l_partkey")).alias("dst"),
                F.lit("SUPPLIES").alias("type"),
                F.create_map().cast("map<string,string>").alias("properties"),
            )
        )
        .unionByName(
            t["customer"].select(
                F.concat(F.lit("locatedin:c:"), s("c_custkey")).alias("id"),
                F.concat(F.lit("c:"), s("c_custkey")).alias("src"),
                F.concat(F.lit("n:"), s("c_nationkey")).alias("dst"),
                F.lit("LOCATED_IN").alias("type"),
                F.create_map().cast("map<string,string>").alias("properties"),
            )
        )
        .unionByName(
            t["supplier"].select(
                F.concat(F.lit("locatedin:s:"), s("s_suppkey")).alias("id"),
                F.concat(F.lit("s:"), s("s_suppkey")).alias("src"),
                F.concat(F.lit("n:"), s("s_nationkey")).alias("dst"),
                F.lit("LOCATED_IN").alias("type"),
                F.create_map().cast("map<string,string>").alias("properties"),
            )
        )
        .unionByName(
            t["nation"].select(
                F.concat(F.lit("partof:"), s("n_nationkey")).alias("id"),
                F.concat(F.lit("n:"), s("n_nationkey")).alias("src"),
                F.concat(F.lit("r:"), s("n_regionkey")).alias("dst"),
                F.lit("PART_OF").alias("type"),
                F.create_map().cast("map<string,string>").alias("properties"),
            )
        )
    )
    return PropertyGraph(
        nodes=nodes,
        edges=edges,
        is_directed=True,
        name=name,
        # schema invariant of THIS projection (see the edge inventory in the
        # module docstring): each edge type's endpoints come from fixed
        # tables, so type-filtered expands can prune the 6-way node union
        # to the declared labels (r14, guide §2.4 — results unchanged, the
        # id join could only ever match those branches).
        rel_endpoint_labels={
            "PLACED": (("Customer",), ("Order",)),
            "CONTAINS": (("Order",), ("Part",)),
            "SUPPLIES": (("Supplier",), ("Part",)),
            "LOCATED_IN": (("Customer", "Supplier"), ("Nation",)),
            "PART_OF": (("Nation",), ("Region",)),
        },
    )


_CO_ORDER_MEMO: dict = {}


def co_order_edges(spark: SparkSession, sf_dir: str):
    """Analytics graph: parts co-occurring in an order (undirected edge
    list src/dst = partkeys, a<b distinct). This is the graph the analytics
    goldens (triangles, PageRank, egonet, degree) run on — the relational
    stand-in for the reference's powergrid edge list (FIXTURES.md F2).

    The self-join is key-partitioned on l_orderkey (co-partitioned shuffle,
    no broadcast needed at scale); distinct collapses multi-lineitem pairs.
    Persisted AND memoized per (session, sf_dir): every analytics consumer
    (degree/triangles/pagerank/egonet) references the edge set more than
    once, and repeated engine calls reuse the one cache entry instead of
    stacking new persists (spark.catalog.clearCache() still frees it).
    """
    key = (id(spark), sf_dir)
    hit = _CO_ORDER_MEMO.get(key)
    if hit is not None:
        # re-arm after a spark.catalog.clearCache(). NOT `hit.is_cached`:
        # on Spark 4.1 that stays True after clearCache (the Dataset keeps
        # a stale non-NONE storage level), so the old guard never re-armed
        # and every post-clearCache consumer recomputed the projection per
        # action (r13; measured 2.6 s per miss at sf0.1). storageLevel is
        # live CacheManager state: all-False means the entry is gone.
        lvl = hit.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            hit.persist()
        return hit
    # r14 (guide §2.4/§2.5): repartition by the GROUPBY KEY instead of the
    # round-robin spread_scan — the keyed exchange is the one the groupBy
    # needs (reused, zero extra shuffles) and it skips round-robin's hidden
    # local sort (sortBeforeRepartition). Interleaved A/B at sf0.1:
    # rebuild 1.94 s (spread) / 1.81 (no spread) / 1.40 (keyed), keyed wins
    # every sample — and EVERY co-order consumer pays this rebuild once per
    # bench run. Scale-free: the partition count derives from AQE/session,
    # and at cluster scale the keyed exchange replaces (not adds to) the
    # aggregation exchange.
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
    )
    # one groupBy shuffle + in-array pair expansion beats the self-join:
    # the join shuffles lineitem twice and feeds ALL n² ordered pairs to
    # distinct; collect_set dedups per order map-side and the slice()
    # expansion emits only x<y pairs — half the distinct input. Per-order
    # arrays are bounded (≤7 lineitems/order in TPC-H at every SF), so
    # collect_set state never skews.
    g = li.groupBy("l_orderkey").agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    out = (
        g.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS src, y AS dst))))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    _CO_ORDER_MEMO[key] = out
    return out


def co_order_weighted_edges(spark: SparkSession, sf_dir: str):
    """Weighted analytics graph: same part co-order pairs, with
    w = 1 / n_shared_orders — strongly co-ordered parts are "close".
    One pair-explosion + one groupBy (count = multiplicity); the pair
    space is the same as co_order_edges, so the same scale notes apply.
    Not memoized: only the weighted-SSSP query reads it, exactly once."""
    # keyed repartition for the same reason as co_order_edges (r14): the
    # groupBy(l_orderkey) reuses this exchange, round-robin's local sort
    # is skipped
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
    )
    g = li.groupBy("l_orderkey").agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    pairs = g.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS src, y AS dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pairs.groupBy("src", "dst").agg(
        (F.lit(1.0) / F.count("*")).alias("weight")
    )


# co-order graph as a DuckDB CTE (mirrors co_order_edges)
CO_ORDER_CTE = """
WITH co_edges AS (
    SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
)
"""


# weighted co-order graph CTE (mirrors co_order_weighted_edges)
CO_ORDER_W_CTE = """
WITH co_w AS MATERIALIZED (
    SELECT l1.l_partkey AS src, l2.l_partkey AS dst,
           CAST(1.0 AS DOUBLE) / COUNT(DISTINCT l1.l_orderkey) AS weight
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    GROUP BY l1.l_partkey, l2.l_partkey
)
"""


# The same projection as a SQL WITH prefix for DuckDB oracles. Only the
# columns oracles need (typed, no property maps): nodes(id,label) + typed
# property lookups are done against the base tables inside each oracle.
TPCH_GRAPH_CTE = """
WITH g_nodes AS (
    SELECT 'c:' || c_custkey AS id, 'Customer' AS label FROM customer
    UNION ALL SELECT 's:' || s_suppkey, 'Supplier' FROM supplier
    UNION ALL SELECT 'p:' || p_partkey, 'Part' FROM part
    UNION ALL SELECT 'o:' || o_orderkey, 'Order' FROM orders
    UNION ALL SELECT 'n:' || n_nationkey, 'Nation' FROM nation
    UNION ALL SELECT 'r:' || r_regionkey, 'Region' FROM region
),
g_edges AS (
    SELECT 'placed:' || o_orderkey AS id, 'c:' || o_custkey AS src,
           'o:' || o_orderkey AS dst, 'PLACED' AS type FROM orders
    UNION ALL
    SELECT 'contains:' || l_orderkey || ':' || l_linenumber,
           'o:' || l_orderkey, 'p:' || l_partkey, 'CONTAINS' FROM lineitem
    UNION ALL
    SELECT 'supplies:' || l_suppkey || ':' || l_partkey,
           's:' || l_suppkey, 'p:' || l_partkey, 'SUPPLIES'
    FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    UNION ALL
    SELECT 'locatedin:c:' || c_custkey, 'c:' || c_custkey,
           'n:' || c_nationkey, 'LOCATED_IN' FROM customer
    UNION ALL
    SELECT 'locatedin:s:' || s_suppkey, 's:' || s_suppkey,
           'n:' || s_nationkey, 'LOCATED_IN' FROM supplier
    UNION ALL
    SELECT 'partof:' || n_nationkey, 'n:' || n_nationkey,
           'r:' || n_regionkey, 'PART_OF' FROM nation
)
"""

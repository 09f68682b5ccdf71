"""Streaming ingest + incremental analytics (reference SURVEY §2.4, §2.6).

The reference's `adstrmk` pipeline — Kafka poll → edge-JSON parse →
streaming partitioner (hash/Fennel/LDG) → socket publish → per-worker
block append (util/kafka/StreamHandler.cpp:65-144,
incremental/JasmineGraphIncrementalLocalStore.cpp:90-145) — maps to
Structured Streaming: readStream → from_json → foreachBatch append.
Partition routing is the writer's hash partitioning; the "-1" EOF
sentinel (StreamHandler.cpp:56-63) disappears (micro-batch semantics).

`strian` — streaming triangle count with per-partition state persisted in
streamingdb (StreamingTriangleCountExecutor.cpp:636-706) — becomes an
incremental counter in foreachBatch: per batch, only triangles touching a
*new* edge are enumerated (|new|·deg work, not a full recount), and the
running total is the state.

File-directory sources stand in for Kafka in tests (the container has no
broker); the transformations are source-agnostic — swap
``readStream.format('kafka') + from_json(value, EDGE_WIRE_SCHEMA)`` in.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jasminegraph_spark.analytics.graph_algs import canonical_undirected
from jasminegraph_spark.sources.readers import EDGE_WIRE_SCHEMA

# r14 §2.6: overlap the tracker's per-batch parquet append with its delta
# job (see StreamingTriangleCounter.process_batch). Module flag so the
# sequential shape stays one toggle away for A/Bs and debugging.
_OVERLAP_APPEND = True


@dataclass
class StreamRegistry:
    """Active stream bookkeeping — the reference's StreamRegistry
    (util/kafka/StreamRegistry.cpp) + `stopstrm`/`KTOP` commands
    (FrontEnd.cpp:263-301)."""

    _streams: dict = field(default_factory=dict)

    def register(self, topic: str, query) -> None:
        self._streams[topic] = query

    def list_topics(self) -> list:
        return [t for t, q in self._streams.items() if q.isActive]

    def stop(self, topic: str) -> bool:
        q = self._streams.pop(topic, None)
        if q is not None and q.isActive:
            q.stop()
            return True
        return False


def parse_edge_wire(raw: DataFrame) -> DataFrame:
    """THE Kafka ingest contract (util/kafka/StreamHandler.cpp:65-144:
    poll → JSON parse → partitioner): takes the kafka source's raw frame
    (binary ``value`` column, as `spark.readStream.format("kafka")...load()`
    yields it — or any frame with that shape), JSON-decodes each record
    against EDGE_WIRE_SCHEMA, and drops malformed records plus the
    reference's ``-1`` EOF sentinel rows (StreamHandler.cpp:56-63 —
    micro-batch triggers replace the sentinel protocol).

    This function IS the tested surface: with no broker in the sandbox,
    tests/test_streaming.py feeds it a kafka-shaped static frame and
    asserts byte-identical results with the file-source parse of the same
    payloads. On a cluster the only swap is the three readStream lines in
    :func:`kafka_edge_stream` (see SCALE.md §Kafka)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EDGE_WIRE_SCHEMA).alias("e")
    ).select("e.*")
    return parsed.filter(
        F.col("source.id").isNotNull() & (F.col("source.id") != "-1")
    )


def kafka_edge_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The reference's Kafka edge source as a Structured Streaming plan:
    kafka format → :func:`parse_edge_wire`.

    Requires the spark-sql-kafka package on the cluster (exact swap-in
    documented in SCALE.md §Kafka; e.g. ``--packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``); this
    sandbox has no broker or connector jar, so the downstream contract is
    tested via parse_edge_wire + the file source (EdgeStreamIngest)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_edge_wire(raw)


def socket_edge_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """LIVE unbounded edge source over a TCP socket (r11, VERDICT r10
    #5): ``readStream.format("socket")`` → :func:`parse_edge_wire` —
    the same wire-parse contract as :func:`kafka_edge_stream`, but on a
    source the sandbox CAN run end-to-end, so a real continuous-trigger
    poll loop (the reference's StreamHandler.cpp:65-144 behavior) is
    exercised in pytest instead of only availableNow file replay. The
    socket source yields a ``value string`` column; parse_edge_wire's
    binary→string cast is a no-op on it. Spark's socket source is a
    test/dev source by design — production streams use the Kafka twin."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_edge_wire(raw)


class EdgeStreamIngest:
    """Append-only property-graph ingest from a stream of edge-JSON lines.

    Writes nodes/edges parquet under ``graph_path`` and maintains running
    vertex/edge counts (the reference updates metadb counts at stream end,
    Partitioner::updateMetaDB — here counts are derivable any time from the
    store, and the last-batch totals are kept on the instance).
    """

    def __init__(self, spark: SparkSession, graph_path: str):
        self.spark = spark
        self.graph_path = graph_path
        self.query = None

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent micro-batch append: each batch overwrites ITS OWN
        ``batch_id=N`` partition (dynamic partition overwrite), so a batch
        replayed after a crash replaces its previous output instead of
        double-appending — exactly-once store contents from
        at-least-once foreachBatch delivery, on plain parquet (a Delta/
        Iceberg transactional sink drops in unchanged). No per-batch
        count job: totals come from the store (total_edges())."""
        edges = batch_df.select(
            F.concat_ws("->", F.col("source.id"), F.col("destination.id")).alias("id"),
            F.col("source.id").alias("src"),
            F.col("destination.id").alias("dst"),
            F.col("properties")["type"].alias("type"),
            F.col("properties").alias("properties"),
        ).withColumn("batch_id", F.lit(batch_id))
        nodes = (
            batch_df.select(F.col("source.id").alias("id"), F.col("source.properties").alias("p"))
            .union(batch_df.select("destination.id", "destination.properties"))
            .groupBy("id")
            .agg(F.first("p", ignorenulls=True).alias("p"))
            .select("id", F.col("p")["label"].alias("label"), F.col("p").alias("properties"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            edges.write.mode("overwrite").partitionBy("batch_id").parquet(
                f"{self.graph_path}/edges"
            )
            nodes.write.mode("overwrite").partitionBy("batch_id").parquet(
                f"{self.graph_path}/nodes"
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def total_edges(self) -> int:
        """Running edge total, derived from the store (metadb-count
        equivalent; always replay-consistent)."""
        return self.edges().count()

    def start(self, source_dir: str, checkpoint_dir: str):
        stream = (
            self.spark.readStream.schema(EDGE_WIRE_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .json(source_dir)
        )
        self.query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        return self.query

    def nodes(self) -> DataFrame:
        """Deduped node view (append store may hold multiple versions)."""
        raw = self.spark.read.parquet(f"{self.graph_path}/nodes")
        return raw.groupBy("id").agg(
            F.first("label", ignorenulls=True).alias("label"),
            F.first("properties", ignorenulls=True).alias("properties"),
        )

    def edges(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.graph_path}/edges").drop("batch_id")


def new_triangle_delta(old_edges: DataFrame, new_edges: DataFrame) -> int:
    """Count triangles that include ≥1 edge from ``new_edges`` given the
    accumulated ``old_edges`` (both arbitrary src/dst frames).

    Incremental core of `strian`: work is |new| · avg-degree (each new
    edge's common-neighborhood), never a recount of the old graph —
    the same asymptotics the reference gets from per-partition cursors
    (StreamingTriangles.cpp:26-104), minus the socket choreography.
    Triangles are deduped on canonical (a<b<c) so multi-new-edge
    triangles count once.
    """
    new_c = canonical_undirected(new_edges)
    old_c = canonical_undirected(old_edges).exceptAll(new_c)
    union_c = old_c.unionAll(new_c)
    return _delta_from_canonical(union_c, new_c, broadcast_new=False)


def _delta_from_canonical(
    union_c: DataFrame,
    new_c: DataFrame,
    broadcast_new: bool,
) -> int:
    """Wedge-count core shared by :func:`new_triangle_delta` and the
    tracker's cached-state fast path. ``union_c`` is the canonical
    (a<b, distinct) edge set of the union graph, ``new_c`` the canonical
    batch. The batch's endpoint sets restrict the adjacency via
    semi-joins BEFORE the (endpoint, z) equi-joins — wedges can only
    hang off a new edge's endpoints, so this never changes the result
    but keeps the accumulated state out of every shuffle: with
    ``broadcast_new`` (small batch vs big state, the streaming steady
    state) the state is map-scanned exactly twice and only
    O(Σ deg(new endpoints)) rows reach the exchanges."""
    hint = F.broadcast if broadcast_new else (lambda df: df)
    # adjacency of the union graph, both directions
    adj = union_c.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        union_c.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    nodes = (
        new_c.select(F.col("a").alias("u"))
        .unionAll(new_c.select(F.col("b").alias("u")))
        .distinct()
    )
    # adjacency restricted to new-edge endpoints: one map-only pass over
    # the state under the broadcast hint; everything downstream works on
    # O(Σ deg(new endpoints)) rows
    adj_s = adj.join(hint(nodes), "u", "semi")
    # min-degree orientation (the batch counter's skew armor,
    # graph_algs._degree_ordered): enumerate each new edge's wedges from
    # its LOWER-degree endpoint, probe the other — fan-out is
    # Σ min(deg(a), deg(b)) instead of Σ deg(a). Degrees aggregate
    # map-side before the (tiny, ≤ 2·|new| rows) shuffle.
    deg = adj_s.groupBy("u").agg(F.count("*").alias("deg"))
    oriented = (
        new_c.join(hint(deg.select(F.col("u").alias("a"),
                                   F.col("deg").alias("deg_a"))), "a")
        .join(hint(deg.select(F.col("u").alias("b"),
                              F.col("deg").alias("deg_b"))), "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b"))
                   & (F.col("a") <= F.col("b"))),
                F.struct(F.col("a").alias("p"), F.col("b").alias("q")),
            )
            .otherwise(
                F.struct(F.col("b").alias("p"), F.col("a").alias("q"))
            )
            .alias("e")
        )
        .select("e.p", "e.q")
    )
    # common neighbors z — two equi-joins, the second keyed on (q, z) so
    # the hash join uses both keys (no neighbor cross-product). The
    # probe side carries the wedge candidates (Σ min-deg rows, the
    # biggest intermediate here); the adjacency sides stay shuffled hash
    # joins at every size — AQE promotes them to broadcast when the
    # restricted adjacency is measured small at runtime, which is a
    # byte-based decision (a row-count heuristic here could force an
    # oversized broadcast on wide-degree graphs).
    nbr_p = adj_s.select(F.col("u").alias("p"), F.col("v").alias("z"))
    nbr_q = adj_s.select(F.col("u").alias("q"), F.col("v").alias("z"))
    tri = (
        hint(oriented).join(nbr_p, "p")
        .join(nbr_q, ["q", "z"])
        .select(
            F.least("p", "q", "z").alias("t1"),
            F.expr("array_sort(array(p, q, z))[1]").alias("t2"),
            F.greatest("p", "q", "z").alias("t3"),
        )
        .distinct()
    )
    return tri.count()


def _neighbor_arrays(union_c: DataFrame) -> DataFrame:
    """Per-node UNORDERED distinct neighbor arrays ``(u, zs)`` of a canonical
    edge set — the adjacency-list representation the tracker's delta
    intersects per new edge. Element order inside ``zs`` is whatever
    ``collect_list`` produced (nondeterministic) — consumers must treat
    the arrays as sets (``array_intersect`` does); do not assume
    sortedness. One groupBy shuffle to build (cold start / tests); warm
    batches maintain it incrementally in process_batch."""
    adj = union_c.select(F.col("a").alias("u"), F.col("b").alias("z")).unionAll(
        union_c.select(F.col("b").alias("u"), F.col("a").alias("z"))
    )
    return adj.groupBy("u").agg(
        F.array_distinct(F.collect_list("z")).alias("zs")
    )


def _delta_from_arrays(
    nbrs: DataFrame, new_c: DataFrame, broadcast_new: bool
) -> int:
    """Tracker fast path: triangles containing ≥1 new edge, via
    ``array_intersect(N(a), N(b))`` per new edge against the cached
    union-graph neighbor arrays. No wedge candidates are ever
    materialized or shuffled — per-edge work is a hash set intersection
    (O(deg(a)+deg(b))), and only the ACTUAL triangle hits reach the
    dedup exchange (multi-new-edge triangles collapse via the canonical
    triple distinct). The arrays are first semi-restricted to the
    batch's endpoints (map-only when the batch broadcasts), so the hash
    joins move O(|new| + touched arrays) rows — never the whole state.
    Broadcasting the array table itself measures SLOWER even when it
    fits (driver collect of the packed adjacency dominates), so the
    lookups stay shuffled hash joins at every size. Caveat for extreme
    hubs: a node's array is its full neighborhood; degree-skewed graphs
    at cluster scale should prefer _delta_from_canonical's shuffled
    wedge join (the generic path), which AQE skew-splits.

    INVARIANT the caller's unpersist ordering depends on (ADVICE r12):
    the returned count SCANS EVERY PARTITION of ``nbrs``. The semi-join
    restricts which rows flow downstream, but its probe side still reads
    the full array table, so when ``nbrs`` is a lazy localCheckpoint the
    count materializes every checkpoint block — that is what makes it
    safe for the tracker to unpersist the previous state generation
    right after this returns. Do NOT push partition pruning or any
    source-level restriction of ``nbrs`` below the checkpoint here:
    partitions skipped by the action would lazily recompute later,
    through lineage whose parent blocks the caller has already
    dropped."""
    hint = F.broadcast if broadcast_new else (lambda df: df)
    # r14: pin the endpoint set — it feeds BOTH semi-restrictions (na and
    # nb), and without the pin Catalyst plans the union+distinct subtree
    # twice (two exchanges + two broadcast builds per batch, seen in the
    # executed plan). Lazy localCheckpoint: RDD identity makes it compute
    # once inside the count job; ~|batch endpoints| rows, released with
    # the frame.
    nodes = (
        new_c.select(F.col("a").alias("u"))
        .unionAll(new_c.select(F.col("b").alias("u")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    touched = nbrs.join(hint(nodes), "u", "semi")
    na = touched.select(F.col("u").alias("a"), F.col("zs").alias("za"))
    nb = touched.select(F.col("u").alias("b"), F.col("zs").alias("zb"))
    # Probe shape (r13, re-measured): left-deep chain with the broadcast
    # hint on the batch side of the FIRST lookup. An alternative
    # two-map-pass shape — hint(new_c)⋈na and hint(new_c)⋈nb joined on
    # (a, b) — was tried to keep each array to one exchange, but the pair
    # join re-exchanges BOTH za and zb; interleaved same-session A/B on
    # st_restart_replay measured it consistently slower (min 13.4 vs
    # 12.9 s), so the left-deep chain stands. Past BROADCAST_BATCH_ROWS
    # the hint drops and AQE picks the strategies.
    tri = (
        hint(new_c).join(na, "a")
        .join(nb, "b")
        .select(
            "a", "b",
            F.explode(F.array_intersect("za", "zb")).alias("z"),
        )
        .select(
            F.least("a", "b", "z").alias("t1"),
            F.expr("array_sort(array(a, b, z))[1]").alias("t2"),
            F.greatest("a", "b", "z").alias("t3"),
        )
        .distinct()
    )
    return tri.count()


def _load_aggregate(
    spark: SparkSession,
    edge_path: str,
    agg_path: str,
    edges_df: DataFrame | None = None,
):
    """Restart-durability guard shared by the streaming trackers: given
    an existing edge-state parquet, load the persisted running aggregate
    and verify it corresponds to EXACTLY the edges on disk (the
    aggregate records the edge row-count it was computed from — a crash
    between the edge append and the aggregate write leaves a mismatch,
    which must raise, never silently resume from a stale total).
    Reference keeps both cursors and counters transactionally in
    streamingdb (ddl/streamingdb.sql streaming_partition/central_store;
    StreamingTriangleCountExecutor.cpp:636-706)."""
    if not os.path.exists(agg_path):
        raise ValueError(
            f"edge state exists at {edge_path} but no aggregate state at "
            f"{agg_path}: resuming would silently recompute from zero. "
            "Delete the state dir to start fresh, or restore the aggregate."
        )
    with open(agg_path) as f:
        agg = json.load(f)
    if edges_df is None:
        edges_df = spark.read.parquet(edge_path)
    n_disk = edges_df.count()
    if agg["n_edge_rows"] != n_disk:
        raise ValueError(
            f"partial streaming state: aggregate at {agg_path} was computed "
            f"from {agg['n_edge_rows']} edge rows but {edge_path} holds "
            f"{n_disk} (crash between edge append and aggregate write?). "
            "Delete the state dir and replay the stream."
        )
    return agg


def _write_aggregate(agg_path: str, payload: dict) -> None:
    """Atomic aggregate write (tmp + rename) so readers never observe a
    torn file. `_`-prefixed names are invisible to Spark's parquet file
    index, so the aggregate can live inside the edge-state directory."""
    tmp = agg_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, agg_path)


class StreamingTriangleCounter:
    """`strian` loop: consume edge batches, maintain accumulated edge set +
    running triangle count (state the reference keeps in streamingdb's
    streaming_partition/central_store tables).

    RESTART-DURABLE: the running total persists to
    ``{state_path}/_aggregate.json`` after every batch (atomic rename),
    keyed to the edge row-count it was computed from; a new counter
    pointed at existing state resumes the exact total, and partial
    state (edges without a matching aggregate) raises instead of
    silently returning delta-sums. Local-fs JSON here; at cluster scale
    the same two files live on the shared FS next to the edge parquet.

    Warm batches run against CACHED per-node neighbor arrays (r11,
    VERDICT r10 #4): the state parquet is read + canonicalized into
    ``(u, zs)`` adjacency lists once per process lifetime, then
    maintained incrementally — per batch the batch's own (tiny)
    adjacency lists are full-outer-merged in with a set-union per
    touched node, a map-heavy plan with no full-state exchange; the
    delta is then one ``array_intersect`` per new edge
    (_delta_from_arrays) that never materializes wedge candidates.
    The durable parquet append stays the source of truth; the cache is
    rebuilt from it on restart (the cold-start recount doubles as the
    integrity check)."""

    # Above this many batch rows the broadcast hints are dropped and
    # Catalyst/AQE pick the join strategy (a huge batch should not be
    # forced driver-side).
    BROADCAST_BATCH_ROWS = 2_000_000

    def __init__(self, spark: SparkSession, state_path: str):
        from jasminegraph_spark.cache import checkpoint

        self.spark = spark
        self.state_path = state_path
        self._agg_path = os.path.join(state_path, "_aggregate.json")
        self._has_state = os.path.isdir(state_path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(state_path)
        )
        self._nbrs: DataFrame | None = None  # cached (u, zs) adjacency lists
        if self._has_state:
            # cold start pays the one full-state read — its recount is
            # the partial-state integrity check (_load_aggregate verifies
            # the persisted n_edge_rows against the parquet on disk) and
            # the SAME frame rebuilds the neighbor-array cache
            state_df = spark.read.parquet(state_path)
            agg = _load_aggregate(
                spark, state_path, self._agg_path, edges_df=state_df
            )
            self.total = agg["total"]
            self._n_rows = agg["n_edge_rows"]
            # lazy localCheckpoint — NOT cache.checkpoint: the durable
            # state here is the edge PARQUET (an executor loss restarts
            # cold from it), and reliable Dataset.checkpoint would
            # re-execute the whole plan a second time at materialization
            # just to write files nothing needs. The first warm batch's
            # delta materializes the rebuilt arrays inside its own job
            # (r12 job-count cut).
            self._nbrs = _neighbor_arrays(
                canonical_undirected(state_df)
            ).localCheckpoint(eager=False)
        else:
            self.total = 0
            self._n_rows = 0

    def process_batch(self, batch_edges: DataFrame, batch_id: int = 0) -> int:
        from jasminegraph_spark.cache import checkpoint

        # pin the batch before acting on it twice: the stamp's count and
        # the parquet append MUST see identical rows, and a
        # non-deterministic batch expression (rand, a changing view)
        # would otherwise drift and only surface as a cold-start
        # integrity ValueError much later (r9, ADVICE r8). Lazy + count
        # = ONE pinning job (the count is the materializing action).
        batch_edges = batch_edges.select("src", "dst").localCheckpoint(eager=False)
        # r8 (r7 verdict #7): the durability stamp's row count is
        # maintained INCREMENTALLY (+= batch rows) instead of recounting
        # the full edge state after every append — per-batch work is the
        # array-merge + per-new-edge intersections plus O(batch), so
        # 100× streaming state no longer turns the stamp into a
        # per-batch full scan. The cold-start recount in _load_aggregate
        # remains the integrity check that catches any drift.
        n_batch = batch_edges.count()
        bcast_new = n_batch <= self.BROADCAST_BATCH_ROWS
        # LAZY localCheckpoints (r12, VERDICT r11 ask #3 — cut per-batch
        # action count): new_c and the merged state are pinned WITHOUT
        # an eager materializing job; the delta count below is the
        # single action that computes canonicalization, the
        # neighbor-array merge, and the per-edge intersections as ONE
        # Spark job (RDD identity makes the multiply-referenced frames
        # compute once inside it). Was 3 jobs per batch. Deliberately
        # NOT cache.checkpoint: the tracker's durable state is the edge
        # parquet (cold start rebuilds from it), and reliable
        # Dataset.checkpoint would re-execute each plan a second time
        # at materialization just to write files nothing reads.
        new_c = canonical_undirected(batch_edges).localCheckpoint(eager=False)
        batch_nbrs = _neighbor_arrays(new_c)  # O(batch) groupBy
        if self._nbrs is not None:
            # merge per touched node; arrays stay exact sets
            # (array_distinct), so replayed edges never bloat them.
            # Untouched nodes pass through map-side — the only shuffle
            # input is the batch's own array table.
            merged = (
                self._nbrs.join(
                    batch_nbrs.withColumnRenamed("zs", "zs_new"), "u", "full"
                )
                .select(
                    "u",
                    F.when(F.col("zs").isNull(), F.col("zs_new"))
                    .when(F.col("zs_new").isNull(), F.col("zs"))
                    .otherwise(
                        F.array_distinct(F.concat("zs", "zs_new"))
                    )
                    .alias("zs"),
                )
            )
        else:
            merged = batch_nbrs
        prev = self._nbrs
        self._nbrs = merged.localCheckpoint(eager=False)
        # r14 (guide §2.6): the durable parquet append and the delta are
        # INDEPENDENT actions — both read only the pinned batch blocks
        # (materialized above by the n_batch count), so the append runs
        # on a driver thread while the (much heavier) delta job executes;
        # Spark schedules both FIFO and the append's map-only tasks
        # back-fill the delta's stragglers. Crash semantics are unchanged:
        # _write_aggregate still happens only after BOTH complete, so a
        # crash mid-either leaves the same edge-rows/aggregate mismatch
        # _load_aggregate already raises on. (A/B'd: persist-chaining the
        # state generations to save the merge's full-state exchange was
        # measured FLAT and reverted — AQE hides cached/checkpointed
        # output partitioning on 4.1, eager or lazy, so the exchange
        # cannot be elided at the DataFrame layer.)
        if _OVERLAP_APPEND:
            import threading

            append_err: list = []

            def _append():
                try:
                    batch_edges.write.mode("append").parquet(self.state_path)
                except BaseException as exc:  # surfaced after the delta join
                    append_err.append(exc)

            appender = threading.Thread(target=_append, name="tracker-append")
            appender.start()
            try:
                delta = _delta_from_arrays(self._nbrs, new_c, bcast_new)
            finally:
                appender.join()
            if append_err:
                raise append_err[0]
        else:  # sequential fallback (A/B + single-threaded debugging)
            delta = _delta_from_arrays(self._nbrs, new_c, bcast_new)
            batch_edges.write.mode("append").parquet(self.state_path)
        self.total += delta
        # only AFTER the delta's action has pinned the merged blocks:
        # unpersisting the previous generation before materialization
        # would force a recompute through its (truncated) lineage.
        # _delta_from_arrays guarantees its count scans every partition
        # of self._nbrs (docstring invariant) — that full scan IS the
        # materialization this ordering relies on
        if prev is not None:
            prev.unpersist()
        self._has_state = True
        self._n_rows += n_batch
        _write_aggregate(
            self._agg_path,
            {"total": self.total, "n_edge_rows": self._n_rows},
        )
        return self.total


class StreamingComponentTracker:
    """Incremental weakly-connected components over edge batches — the
    WCC twin of the `strian` loop (reference keeps per-partition stores
    the same way; here the state is an accumulated edge parquet + the
    current label table). Per batch the tracker does FRONTIER work, not
    a recount: new edges seed a changed-label set (the min of their
    endpoints' labels), and each propagation round joins ONLY the
    changed frontier against the accumulated adjacency — cost
    O(edges incident to the frontier) per round, rounds bounded by the
    diameter of the newly merged region. Warm labels are valid upper
    bounds, and hash-min flooding from the frontier reaches every node
    of a merged component, so after each batch the labels equal the
    from-scratch WCC of the prefix graph EXACTLY (the fixpoint — min
    reachable node id — is unique; the driver row hash-checks every
    prefix against an unrolled SQL recount). Raises if ``max_rounds``
    exhausts while labels still shrink."""

    def __init__(self, spark: SparkSession, state_path: str, max_rounds: int = 60):
        from jasminegraph_spark.cache import checkpoint

        self.spark = spark
        self.state_path = state_path
        self.max_rounds = max_rounds
        self._labels: DataFrame | None = None
        # RESTART-DURABLE: labels persist to {state_path}/labels after
        # every batch; _aggregate.json under the edge dir records the
        # edge row-count the labels correspond to. Existing edge state
        # resumes from the persisted labels (checkpointed on load so the
        # overwrite of labels/ never races its own lineage); partial
        # state raises — a fresh tracker seeded only from new-batch
        # nodes would silently break the labels == prefix-WCC invariant.
        edge_path = f"{state_path}/edges"
        self._n_rows = 0
        if os.path.isdir(edge_path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(edge_path)
        ):
            agg_path = os.path.join(edge_path, "_aggregate.json")
            # cold-start full recount = the integrity check (r8: warm
            # batches stamp an incrementally-maintained count instead)
            agg = _load_aggregate(spark, edge_path, agg_path)
            self._n_rows = agg["n_edge_rows"]
            labels_path = f"{state_path}/labels"
            if not os.path.isdir(labels_path):
                raise ValueError(
                    f"edge state exists at {edge_path} but no label state at "
                    f"{labels_path}: delete the state dir to start fresh."
                )
            self._labels = checkpoint(spark.read.parquet(labels_path))

    def process_batch(self, batch_edges: DataFrame, batch_id: int = 0) -> DataFrame:
        from jasminegraph_spark.cache import checkpoint

        # pinned so the stamp count and the append see identical rows
        # even for non-deterministic batch expressions (r9, ADVICE r8)
        e = batch_edges.select("src", "dst").localCheckpoint(eager=True)
        edge_path = f"{self.state_path}/edges"
        self._n_rows += e.count()  # O(batch); stamp no longer rescans state
        e.write.mode("append").parquet(edge_path)
        all_e = self.spark.read.parquet(edge_path)
        adj = all_e.unionAll(
            all_e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).select(F.col("src").alias("u"), F.col("dst").alias("v"))

        labels = self._labels
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        if labels is None:
            labels = nodes.withColumn("component", F.col("node"))
        else:
            labels = (
                labels.unionByName(
                    nodes.join(labels, "node", "left_anti").withColumn(
                        "component", F.col("node")
                    )
                )
            )
        labels = checkpoint(labels)
        # frontier seed: endpoints of the NEW edges take the min of the
        # two endpoint labels; only rows whose label shrinks enter
        ends = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        la = labels.withColumnRenamed("node", "a").withColumnRenamed("component", "ca")
        lb = labels.withColumnRenamed("node", "b").withColumnRenamed("component", "cb")
        seeded = ends.join(la, "a").join(lb, "b").select(
            F.col("a").alias("node"), F.least("ca", "cb").alias("cand")
        ).unionAll(
            ends.join(la, "a").join(lb, "b").select(
                F.col("b").alias("node"), F.least("ca", "cb").alias("cand")
            )
        ).groupBy("node").agg(F.min("cand").alias("cand"))
        changed = (
            seeded.join(labels, "node")
            .filter(F.col("cand") < F.col("component"))
            .select("node", F.col("cand").alias("component"))
            .transform(checkpoint)
        )
        rounds = 0
        while changed.take(1):
            if rounds >= self.max_rounds:
                raise RuntimeError(
                    f"incremental WCC did not converge within "
                    f"max_rounds={self.max_rounds}; labels still shrinking"
                )
            labels = checkpoint(
                labels.join(changed.withColumnRenamed("component", "nc"), "node", "left")
                .select(
                    "node",
                    F.least(F.col("component"), F.coalesce("nc", F.col("component"))).alias(
                        "component"
                    ),
                )
            )
            nbr = (
                adj.join(changed.withColumnRenamed("node", "u"), "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("component").alias("cand"))
            )
            changed = (
                nbr.join(labels, "node")
                .filter(F.col("cand") < F.col("component"))
                .select("node", F.col("cand").alias("component"))
                .transform(checkpoint)
            )
            rounds += 1
        self._labels = labels
        labels.write.mode("overwrite").parquet(f"{self.state_path}/labels")
        _write_aggregate(
            os.path.join(edge_path, "_aggregate.json"),
            {"n_edge_rows": self._n_rows},
        )
        return labels

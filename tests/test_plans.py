"""Physical-plan assertions: the scale properties the engine is designed
around, checked on real executed plans (not guessed).

At 100 TB these properties are the difference between a job that works
and one that doesn't: predicate/column pushdown reaching the parquet scan,
small dimensions broadcasting, expansions staying equi-joins (never
cartesian), and whole-stage codegen covering the hot expressions.
"""

import pytest

import __spark_entry__ as entry_mod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return entry_mod.queries()[name](spark, sf_dir)

    return run


def test_label_scan_prunes_union_branches(q):
    """Filtering the 6-label node union by one label must constant-fold
    away the other 5 branches: exactly one parquet scan remains."""
    plan = _plan(q("cy_node_scan_by_label"))
    assert plan.count("Scan parquet") == 1
    assert "customer.parquet" in plan


def test_point_seek_filters_at_scan_with_pruned_columns(q):
    """The projected-graph id is concat('c:', key) — not invertible by
    Catalyst, so it can't reach PushedFilters; but the equality must sit
    directly on the scan (DataFilters) with only the key column read.
    (A materialized graph — GraphCatalog.save — gets true pushdown on id.)"""
    plan = _plan(q("cy_node_by_id_seek"))
    assert "DataFilters: [(concat(c:, cast(c_custkey" in plan
    assert "ReadSchema: struct<c_custkey:bigint>" in plan


def test_q6_pushes_range_filters(q):
    plan = _plan(q("rel_q6_forecast_revenue"))
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan
    # column pruning: only the 4 needed columns are read
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "l_orderkey" not in read_schema


def test_q5_broadcasts_small_dims(q):
    plan = _plan(q("rel_q5_local_supplier_volume"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_expand_is_equi_join_not_cartesian(q):
    plan = _plan(q("cy_expand_two_hop"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cartesian_only_when_asked(q):
    # the explicit cartesian operator is allowed to nested-loop (tiny dims)
    plan = _plan(q("cy_cartesian_product"))
    assert "Join" in plan or "CartesianProduct" in plan


def test_whole_stage_codegen_covers_agg(q):
    df = q("rel_q1_pricing_summary")
    df.collect()  # AQE: codegen spans appear in the final executed plan
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in plan and "isFinalPlan=true" in plan
    # hash aggregate with partial (map-side) combine before the exchange
    assert plan.count("HashAggregate") >= 2


def test_topk_uses_limit_pushdown(q):
    plan = _plan(q("rel_events_topk_users"))
    # TakeOrderedAndProject = per-partition top-k + merge, not a full sort
    assert "TakeOrderedAndProject" in plan


def test_triangle_result_is_checkpointed_and_caches_released(spark, sf_dir):
    """The canonical edge set persists ONLY during the triangle job (it
    feeds the degree calc and both adjacency-array joins — dozens of
    re-executed lineitem self-joins without it); finalize() then
    materializes the one-row result and releases the intermediates, so
    repeated engine analytics calls don't pin executor storage."""
    from jasminegraph_spark.analytics import triangle_count_df
    from jasminegraph_spark.projection import co_order_edges

    df = triangle_count_df(co_order_edges(spark, sf_dir))
    # result lineage is truncated: a checkpoint scan, no live joins/caches
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan
    assert "InMemoryTableScan" not in plan


def test_co_order_memo_rearms_after_clear_cache(spark, sf_dir):
    """r13: spark.catalog.clearCache() kills the memoized co-order cache
    entry, but on Spark 4.1 the Dataset's is_cached stays True — the old
    re-arm guard never fired and every later consumer recomputed the
    projection per action. The memo must re-persist (live storageLevel
    check) so post-clearCache consumer plans read InMemoryTableScan."""
    from jasminegraph_spark.projection import co_order_edges

    co = co_order_edges(spark, sf_dir)
    co.count()
    spark.catalog.clearCache()
    co2 = co_order_edges(spark, sf_dir)
    lvl = co2.storageLevel
    assert lvl.useMemory or lvl.useDisk, "memo did not re-arm its persist"
    plan = _plan(co2.selectExpr("src as a", "dst as b"))
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_iterative_algs_release_their_caches(spark):
    """After an analytics call on a non-memoized input, the DataFrame
    cache manager holds nothing: every operator-internal persist was
    released by finalize(). (co_order_edges is excluded by design — its
    cache entry is memoized for cross-query reuse.)"""
    from pyspark.sql import functions as F

    from jasminegraph_spark.analytics import link_prediction, pagerank, triangle_count_df
    from jasminegraph_spark.pipeline import minhash_lsh_candidates

    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 50) for i in range(120)], ["src", "dst"]
    )
    triangle_count_df(edges).collect()
    pagerank(edges, iterations=3, undirected=True).count()
    link_prediction(edges, top_k=10).count()
    docs = spark.createDataFrame(
        [(i, f"document text {i % 7} repeated payload") for i in range(40)],
        ["doc_id", "text"],
    )
    minhash_lsh_candidates(docs).count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "operator-internal persists were not released"


def test_bucketed_graph_expand_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketed nodes (by id) + edges (by src): the expansion join must
    read both sides bucket-locally — no Exchange on the probe side."""
    from jasminegraph_spark.graph import GraphCatalog
    from jasminegraph_spark.projection import tpch_graph
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    cat = GraphCatalog(spark)
    g = tpch_graph(spark, sf_dir)
    cat.save_bucketed(g, buckets=8)
    gb = cat.load_bucketed("tpch")

    nodes = gb.nodes
    edges = gb.edges
    # at test scale Catalyst rightly prefers broadcast; disable it to
    # exercise the at-scale path where bucketing replaces the shuffle
    # (set BEFORE building the join — QueryExecution snapshots the conf)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = edges.join(nodes, edges.src == nodes.id)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # sort-merge join directly over bucketed scans: no hash exchange
        # of either table (bucket co-location replaces the shuffle)
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == g.edges.count()
        # point seek on the bucketed node table prunes to one bucket
        # (autoBucketedScan off: planner otherwise skips bucketed reading
        # for scan-only queries and with it the pruning)
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        seek = nodes.filter(F.col("id") == "c:42")
        splan = seek._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in splan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def test_salted_agg_exact_and_two_stage(spark):
    """Salted aggregation must be exact vs plain groupBy, and the plan
    must show the two aggregation phases around two exchanges."""
    import random

    from pyspark.sql import functions as F

    from jasminegraph_spark.operators.skew import salted_agg

    rnd = random.Random(3)
    # heavy skew: 90% of rows share one key
    rows = [("hot" if rnd.random() < 0.9 else f"k{rnd.randrange(20)}", rnd.randrange(1000))
            for _ in range(5000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"n": (F.count("*"), "sum"), "total": (F.sum("v"), "sum"), "mx": (F.max("v"), "max")},
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_link_prediction_stays_equi_join(q):
    """Wedge enumeration + scoring must be hash/sort-merge equi-joins —
    a cartesian over the adjacency would be |E|² at scale."""
    plan = _plan(q("an_link_prediction"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dup_has_no_all_pairs_join(q):
    """The shipped near-dup query must generate candidates from the LSH
    band bucket equi-join — the O(n²) BroadcastNestedLoopJoin on
    id_a < id_b is the test oracle only, never the shipped plan."""
    plan = _plan(q("pl_embedding_near_dup"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_verified_dedup_has_no_all_pairs_join(q):
    """Jaccard verification must run on LSH candidates (linear in
    candidate pairs), not the quadratic shingle self-join."""
    plan = _plan(q("pl_lsh_verified_dedup"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_near_dup_has_no_all_pairs_join(q):
    plan = _plan(q("pl_simhash_near_dup"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_linkpred_stays_equi_join(q):
    """Wedge candidates + feature scoring: hash/sort-merge equi-joins
    only, like the Jaccard predictor."""
    plan = _plan(q("an_link_prediction_embedding"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_window_not_range_join(q):
    """The as-of join must plan as union + window over a key shuffle —
    a per-row time-inequality join would be a BroadcastNestedLoopJoin."""
    plan = _plan(q("rel_asof_last_purchase"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_pack_sequences_window_is_partitioned(q):
    """The packing cumsum must window over (grp, shard) partitions — an
    unpartitioned window funnels the whole corpus through ONE task at
    scale (Spark even warns about it)."""
    plan = _plan(q("pl_pack_sequences"))
    assert "Window" in plan
    # the partition spec must name both keys; an empty partitionBy would
    # render as 'Window [... ORDER BY ...]' with no partition columns
    import re

    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("grp" in ln and "shard" in ln for ln in win_lines), win_lines


def test_spgemm_linkpred_output_exchange_is_tiny(spark, sf_dir):
    """The SpGEMM path's only exchange after the map stage is the global
    top-k (TakeOrderedAndProject over the mapInPandas output) — no wedge
    groupBy/shuffle may appear. Asserted on the pre-checkpoint frame (the
    registered query finalize-checkpoints, which truncates its plan)."""
    from jasminegraph_spark.analytics.graph_algs import canonical_undirected
    from jasminegraph_spark.analytics.linkpred import _spgemm_topk
    from jasminegraph_spark.projection import co_order_edges

    und = canonical_undirected(co_order_edges(spark, sf_dir))
    df = _spgemm_topk(und, 50, 2, "auto", "jaccard")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" in plan
    assert "HashAggregate" not in plan  # counting happened inside the kernel
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ---------------- round-4 continuation plan assertions ----------------


def test_q19_disjunction_stays_hash_join(q):
    """OR'd brand/size/quantity branches must not degrade the part join to
    a nested-loop: the common p_partkey equi-key keeps it hash/broadcast,
    with the disjunction as a post-probe residual."""
    plan = _plan(q("rel_q19_disjunctive_predicates"))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_becomes_semi_join(q):
    """EXISTS decorrelates to LEFT SEMI with the date filter pushed to the
    orders scan."""
    plan = _plan(q("rel_q4_order_priority"))
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan


def test_q22_anti_join_with_scalar_gate(q):
    plan = _plan(q("rel_q22_dormant_customers"))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the 1-row scalar average broadcasts; customers never shuffle for it


def test_decontaminate_broadcasts_benchmark_side(q):
    """The benchmark n-gram set is tiny vs the corpus: the overlap join
    must be a broadcast — the train side never shuffles for the probe."""
    plan = _plan(q("pl_decontaminate"))
    assert "BroadcastHashJoin" in plan


def test_pii_redact_is_map_only(q):
    """PII redaction has NO wide operator before the final audit
    aggregate: exactly one exchange (the 1-row aggregate's)."""
    plan = _plan(q("pl_pii_redact"))
    assert plan.count("Exchange") <= 2  # partial->final agg only


def test_sq_ann_broadcasts_queries_and_calibration(q):
    """SQ ANN must keep the exact-cosine plan shape: corpus streams once,
    queries + calibration broadcast, no corpus shuffle before ranking."""
    plan = _plan(q("pl_sq_ann"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(q):
    """A-ES top-k must run as TakeOrdered (per-partition top-k + k-row
    merge), never a global sort of the corpus."""
    plan = _plan(q("pl_weighted_sample"))
    assert "TakeOrderedAndProject" in plan


def test_kmv_min_selection_is_take_ordered(q):
    plan = _plan(q("pl_kmv_distinct"))
    assert "TakeOrderedAndProject" in plan


def test_interval_join_is_bucketed_equi_join(q):
    """The pure-inequality interval join must decompose into the bucket
    hash equi-join + residual filter — a direct range predicate would be
    a BroadcastNestedLoopJoin (O(|P|·|I|))."""
    plan = _plan(q("rel_interval_join_busy_hours"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_line_dedup_no_nested_loop(q):
    """Line dedup joins on the line hash — any BNLJ/cartesian means the
    boilerplate-count join degenerated."""
    plan = _plan(q("pl_line_dedup"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_is_map_side_only(q):
    """Chunking must be one scan: split → sequence → slice → explode,
    with NO shuffle before the (test-only) final sort."""
    plan = _plan(q("pl_chunk_documents"))
    before_sort = plan.split("Sort", 1)[0]
    assert "Exchange hashpartitioning" not in before_sort
    assert "Generate explode" in plan


def test_temperature_mixture_broadcasts_fractions(q):
    """The per-domain keep-fraction table (5 rows) must broadcast back
    onto the corpus — a shuffle join would move the whole corpus for a
    handful of fractions."""
    plan = _plan(q("pl_temperature_mixture"))
    assert "BroadcastHashJoin" in plan


def test_weighted_sssp_stays_equi_join(q):
    """Bellman-Ford rounds are equi-joins on src — no per-row inequality
    anywhere."""
    plan = _plan(q("an_weighted_shortest_paths"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_json_props_extract_prunes_to_two_columns(q):
    """The JSON parse reads exactly (event_type, props) — nothing else of
    the events table leaves the scan, and the parse stays a codegen
    expression (no Python)."""
    plan = _plan(q("rel_json_props_extract"))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" in read_schema and "event_type" in read_schema
    assert "user_id" not in read_schema and "value" not in read_schema
    assert "from_json" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_graphrag_seed_expansion_broadcasts(q):
    """The 10-doc seed set and its entity set are tiny: both expansion
    joins against corpus-scale frames must broadcast them. (The plan DOES
    contain BroadcastNestedLoopJoin nodes — those are the intentional
    1-row scalar crosses inside BM25 (corpus stats row) and cosine (the
    single query vector), corpus × 1, not a scale risk; what must never
    appear is an un-broadcast CartesianProduct.)"""
    plan = _plan(q("pl_graphrag_retrieve"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_alternating_cc_rounds_are_aggregates_not_nested_loops(q):
    """Every large-star/small-star round is groupBy-min + equi-join; a
    nested-loop anywhere would break the O(log n)-round scale story."""
    plan = _plan(q("an_wcc_alternating"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_substring_spans_no_nested_loop(q):
    """Exact-substring span candidates come from the capped shingle
    hash join; an all-pairs nested loop anywhere kills the scale story."""
    plan = _plan(q("pl_substring_spans"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gopher_rules_single_scan_no_shuffle(q):
    """The full Gopher rule set is one narrow projection: exactly one
    scan of documents, no Exchange (signals are per-row expressions)."""
    plan = _plan(q("pl_gopher_rules"))
    assert plan.count("Scan parquet") == 1
    body = plan.split("ReadSchema:")[0]
    # the only exchange allowed is the final orderBy's range partitioning
    assert body.count("Exchange hashpartitioning") == 0


def test_triplet_mining_broadcasts_anchors(q):
    """The broadcast side must be the ANCHORS, not the corpus (r5
    verdict #9 — mirrors test_sq_ann_broadcasts_queries): the corpus
    streams through the BNLJ build-side-free, so at 100 TB only the
    bounded anchor table crosses the cluster."""
    plan = _plan(q("pl_triplet_mining"))
    lines = plan.splitlines()
    (bnlj_idx,) = [i for i, ln in enumerate(lines) if "BroadcastNestedLoopJoin" in ln]
    assert "BuildRight" in lines[bnlj_idx]
    # the BroadcastExchange subtree (right child) carries the anchor
    # projection; the corpus scan must sit OUTSIDE it (streamed side)
    (bex_idx,) = [i for i, ln in enumerate(lines) if "BroadcastExchange" in ln]
    assert bex_idx > bnlj_idx
    subtree = "\n".join(lines[bex_idx:])
    assert "anchor_id" in subtree
    streamed = "\n".join(lines[:bex_idx])
    assert "Scan parquet" in streamed or "Scan ExistingRDD" in streamed


def test_scc_rounds_are_equi_joins(q):
    """Trim anti-joins + hash-min propagation: every SCC round is an
    equi-join/aggregate — no cartesian anywhere."""
    plan = _plan(q("an_scc"))
    assert "CartesianProduct" not in plan


def test_c4_rules_single_scan_no_shuffle(q, spark, sf_dir):
    """C4 heuristics are one narrow projection over the documents scan —
    no aggregation, no hash exchange (mirrors
    test_gopher_rules_single_scan_no_shuffle). r13: the declared row pins
    the map-only child with a lazy pin (entry _pin) before its orderBy (so
    range-bound sampling doesn't execute the regex pass twice), which
    collapses the declared plan to Sort-over-pinned-scan; the chain
    property is asserted on the declared query's OWN pre-pin frame
    (entry _c4_rules_prepin — shared construction, ADVICE r13 #4)."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod._c4_rules_prepin(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    body = plan.split("ReadSchema:")[0]
    assert body.count("Exchange hashpartitioning") == 0
    # and the declared row reads pinned blocks under its sort: the child
    # must not appear (re-execute) below the range partitioner
    declared = _plan(q("pl_c4_rules"))
    assert "Scan ExistingRDD" in declared
    assert declared.count("Scan parquet") == 0


def test_kmeans_assignment_broadcasts_centroids_and_group_limits(spark, sf_dir):
    """The centroid-assignment pass (shared by kmeans_centroids Lloyd
    rounds, ivf_assign, and semantic_dedup) must broadcast the centroid
    table and reduce the n×k score frame with WindowGroupLimit BEFORE
    the exchange (top-1 per partition map-side) — the property that
    keeps assignment shuffle volume at O(n), not O(n×k). (The
    pl_kmeans_refine row itself checkpoints via finalize, so the
    assignment subplan is asserted here directly.)"""
    from jasminegraph_spark.pipeline.similarity import ivf_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(ivf_assign(emb, n_cells=8))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_node2vec_corpus_no_cartesian(q):
    """Every corpus step is an equi-join of walkers against the
    persisted adjacency + an argmax aggregate — no cartesian, no BNLJ."""
    plan = _plan(q("an_node2vec_corpus"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_png_decode_is_single_scan_arrow_stage(q, spark, sf_dir):
    """synthesize → decode is two chained mapInPandas stages over ONE
    documents scan — payloads never shuffle. r13: the declared row pins
    the decoded rows (lazy pin, entry _pin) before its orderBy so the
    range sampler doesn't run the decode chain twice; the chain property
    is asserted on the declared query's OWN pre-pin frame (entry
    _png_decode_prepin — shared construction, ADVICE r13 #4), the pin on
    the declared plan."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod._png_decode_prepin(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    body = plan.split("ReadSchema:")[0]
    assert body.count("Exchange hashpartitioning") == 0
    assert "MapInPandas" in plan
    declared = _plan(q("pl_png_decode"))
    assert "Scan ExistingRDD" in declared
    assert declared.count("Scan parquet") == 0 and "MapInPandas" not in declared


def test_bigram_logprob_preaggregates_per_doc(q):
    """r7 (r6 verdict perf ask #4): the bigram score joins must carry the
    (doc_id, w1, w2)-deduped stream, not one row per occurrence — the
    plan shows a hash aggregate keyed on all three columns BELOW the
    count-table joins (with its map-side partial), shrinking the
    zipfian-headed w1 join by the per-doc repetition factor."""
    plan = _plan(q("pl_bigram_logprob"))
    agg_lines = [
        ln
        for ln in plan.splitlines()
        if "HashAggregate" in ln
        and "doc_id" in ln
        and "w1" in ln
        and "w2" in ln
    ]
    # partial + final pair for the pre-aggregation
    assert len(agg_lines) >= 2, plan[:4000]


def test_spread_scan_keeps_pushdown_below_the_exchange(spark, sf_dir):
    """r12 (VERDICT r11 ask #4a): the scan-spread exchange must not cost
    pushdown — a filtered, projected read of `documents` through
    load_tables shows the predicate in PushedFilters and a pruned
    ReadSchema on the parquet Scan BELOW the round-robin Exchange."""
    from pyspark.sql import functions as F

    from jasminegraph_spark.session import load_tables

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    out = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_at = plan.find("Scan parquet")
    assert scan_at != -1
    # the filter reached the scan...
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # ...with only the referenced columns read (text never leaves disk)
    import re

    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    cols = {c.split(":")[0] for c in read_schema.split(",") if c}
    assert cols == {"doc_id", "lang", "n_chars"}
    # and the spread exchange sits ABOVE the scan (single-row-group local
    # files spread; at cluster scale spread_scan is a no-op — next test)
    rr_at = plan.find("Exchange roundrobin")
    if rr_at != -1:  # only present when the local file needed spreading
        assert rr_at < scan_at  # toString prints parents first


def test_spread_scan_noop_when_already_parallel(spark):
    """r12 (VERDICT r11 ask #4b): spread_scan must return the SAME
    DataFrame object (no exchange) when the input already has at least
    session-parallelism partitions — the cluster-scale shape, where
    inputs arrive in many splits."""
    from jasminegraph_spark.session import spread_scan

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000).repartition(par)
    assert spread_scan(wide) is wide
    wider = spark.range(0, 10_000).repartition(par + 3)
    assert spread_scan(wider) is wider

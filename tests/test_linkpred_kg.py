"""Link prediction (train/predict/merge surface) and constructkg pipeline."""

import pytest

from jasminegraph_spark.analytics import link_prediction
from jasminegraph_spark.pipeline import (
    construct_knowledge_graph,
    extract_triples,
    triple_weights,
)
from jasminegraph_spark.pipeline.kg import llm_extractor


def test_link_prediction_known_graph(spark):
    # star around 0 with leaves 1..4, plus edge 1-2. Non-adjacent pairs
    # sharing ≥2 neighbors: (3,4) via {0}? no — only one common neighbor;
    # use two hubs: 0 and 9 both connected to 1..4
    edges = [(0, i) for i in range(1, 5)] + [(9, i) for i in range(1, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = link_prediction(df, top_k=100, min_common=2).collect()
    pairs = {(r["a"], r["b"]): (r["common_neighbors"], r["jaccard"]) for r in got}
    # leaves i<j share exactly {0, 9}; deg(leaf)=2 → jaccard = 2/(2+2-2)=1.0
    for i in range(1, 5):
        for j in range(i + 1, 5):
            assert pairs[(i, j)] == (2, 1.0)
    # hubs 0,9 share neighbors 1..4; deg=4 → 4/(4+4-4)=1.0
    assert pairs[(0, 9)] == (4, 1.0)
    assert len(pairs) == 7
    # existing edges are never predicted
    assert (0, 1) not in pairs


def test_link_prediction_center_degree_cap(spark):
    # capping out the shared hub removes all its wedges
    edges = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert link_prediction(df, top_k=10, min_common=1).count() == 6  # C(4,2)
    assert (
        link_prediction(df, top_k=10, min_common=1, max_center_degree=3).count() == 0
    )


def test_link_prediction_strategies_agree(spark):
    # the replicated-CSR SpGEMM path and the wedge-join path must produce
    # identical rows (same candidates, same scores, same order)
    import random

    from jasminegraph_spark.analytics import link_prediction_embedding

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(160)})
    df = spark.createDataFrame(edges, ["src", "dst"])
    for fn in (link_prediction, link_prediction_embedding):
        for cap in ("auto", None, 8):
            got_sp = fn(df, top_k=20, min_common=2, max_center_degree=cap,
                        strategy="spgemm").collect()
            got_we = fn(df, top_k=20, min_common=2, max_center_degree=cap,
                        strategy="wedge").collect()
            assert [tuple(r) for r in got_sp] == [tuple(r) for r in got_we], (
                fn.__name__,
                cap,
            )


def test_trained_link_predictor_beats_jaccard_auc(spark):
    # cora.cites is the reference's own GraphSAGE training fixture
    # (supervised.py trains on it); the learned model must separate
    # held-out edges from non-edges better than the raw Jaccard heuristic
    # computed on the same feature graph
    from pyspark.sql import functions as F

    from jasminegraph_spark.analytics import auc, train_link_predictor

    raw = spark.read.csv(
        "/root/reference/tests/integration/env_init/data/cora/cora.cites", sep="\t"
    ).toDF("src", "dst")
    edges = raw.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    _, scored = train_link_predictor(edges)
    scored = scored.persist()
    model_auc = auc(scored)
    jaccard_auc = auc(scored, "jac")
    assert model_auc > jaccard_auc + 0.05  # decisively, not by noise
    assert model_auc > 0.75
    scored.unpersist()


@pytest.mark.sweep  # r14: multi-minute quality/property row -> sweep tier (see pyproject)
def test_sage_encoder_beats_flat_features(spark):
    """The 2-layer mean-aggregator SAGE encoder (the reference's model
    family, linkpred.sage_embeddings) must improve held-out AUC over the
    1-hop structural profile through the identical trained head on the
    reference's own cora fixture (measured: 0.779 vs 0.763)."""
    from pyspark.sql import functions as F

    from jasminegraph_spark.analytics import auc, train_link_predictor

    raw = spark.read.csv(
        "/root/reference/tests/integration/env_init/data/cora/cora.cites", sep="\t"
    ).toDF("src", "dst")
    edges = raw.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    _, flat = train_link_predictor(edges)
    flat_auc = auc(flat.persist())
    _, sage = train_link_predictor(edges, encoder="sage")
    sage_auc = auc(sage.persist())
    assert sage_auc > flat_auc
    assert sage_auc > 0.77
    flat.unpersist(), sage.unpersist()


def test_sage_embedding_shape_and_layer0_identity(spark):
    from jasminegraph_spark.analytics import node_embeddings, sage_embeddings

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], ["src", "dst"]
    )
    emb = sage_embeddings(edges, layers=2)
    # 4 base + 4 layer-1 + 8 layer-2 columns, v first
    assert len(emb.columns) == 17
    base = {r["v"]: (r["f1"], r["f2"]) for r in node_embeddings(edges).collect()}
    got = {r["v"]: (r["f1"], r["f2"]) for r in emb.collect()}
    assert got == base  # layer-0 slice is untouched by deeper layers
    # layer-1 mean of degrees around node 2 (nbrs 1, 3 → degrees 3, 3)
    row = {r["v"]: r for r in emb.collect()}[2]
    assert row["l1_f1"] == 3.0


@pytest.mark.sweep  # r14: multi-minute quality/property row -> sweep tier (see pyproject)
def test_federated_merge_matches_global_training(spark):
    """The reference's `merge` verb analog: 4 disjoint-shard logistic
    heads FedAvg'd into one model must (a) decisively beat the raw
    Jaccard heuristic and (b) land within a few AUC points of the
    globally trained model on the same cora fixture."""
    from pyspark.sql import functions as F

    from jasminegraph_spark.analytics import (
        auc,
        federated_train_merge,
        train_link_predictor,
    )

    raw = spark.read.csv(
        "/root/reference/tests/integration/env_init/data/cora/cora.cites", sep="\t"
    ).toDF("src", "dst")
    edges = raw.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    coefficients, intercept, scored = federated_train_merge(edges, n_workers=4)
    scored = scored.persist()
    fed_auc = auc(scored)
    jac_auc = auc(scored, "jac")
    assert len(coefficients) == 15 and isinstance(intercept, float)
    assert fed_auc > jac_auc + 0.05
    assert fed_auc > 0.72
    _, global_scored = train_link_predictor(edges)
    assert abs(fed_auc - auc(global_scored)) < 0.05
    scored.unpersist()


def test_trained_predictor_query_shape(spark):
    # the driver row is now the oracle-checkable example feature table
    # (split + negatives + cn/jac/aa) — the deterministic slice of the
    # lifecycle; the fit itself is covered by the AUC tests above
    from __spark_entry__ import an_link_prediction_trained

    feats = an_link_prediction_trained(spark, "/root/testdata/sf0.001")
    rows = feats.collect()
    assert feats.columns == ["a", "b", "label", "cn", "jac", "aa"]
    assert {r["label"] for r in rows} == {0, 1}
    assert any(r["cn"] > 0 for r in rows)


def test_trained_predictor_topk_shape(spark):
    from jasminegraph_spark.analytics import link_prediction_trained
    from jasminegraph_spark.projection import co_order_edges

    top = link_prediction_trained(
        co_order_edges(spark, "/root/testdata/sf0.001"), top_k=100
    )
    rows = top.collect()
    assert top.columns == ["a", "b", "label", "score_r"]
    assert len(rows) == 100
    # scores descend; mostly true edges at the top if the model learned
    scores = [r["score_r"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_extract_triples_and_weights(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c d"), (2, "a b c")], ["doc_id", "text"]
    )
    trips = extract_triples(docs).collect()
    # greedy non-overlapping: doc1 → (a,b,c),(a,b,c) [d is a leftover], doc2 → (a,b,c)
    assert sorted((r.doc_id, r.s, r.p, r.o) for r in trips) == [
        (1, "a", "b", "c"),
        (1, "a", "b", "c"),
        (2, "a", "b", "c"),
    ]
    w = triple_weights(extract_triples(docs)).collect()
    assert [(r.s, r.p, r.o, r.weight, r.n_docs) for r in w] == [("a", "b", "c", 3, 2)]


def test_construct_kg_registers_graph(spark, tmp_path):
    from jasminegraph_spark.engine import JasmineEngine

    docs = spark.createDataFrame(
        [(1, "x likes y while y hates z"), (2, "x likes y")], ["doc_id", "text"]
    )
    eng = JasmineEngine(spark)
    g = eng.construct_kg("kg", docs)
    edges = {(r.src, r.type, r.dst, r.weight) for r in g.edges.collect()}
    assert ("x", "likes", "y", 2) in edges
    # greedy triples: (x,likes,y) ×2 and (while,y,hates); z is a leftover
    # tail token — nodes = subjects ∪ objects = {x, y, while, hates}
    assert g.nodes.count() == len({"x", "y", "while", "hates"})
    assert eng.vertex_count("kg") == g.nodes.count()


def test_engine_predict_links(spark):
    from jasminegraph_spark.engine import JasmineEngine
    from jasminegraph_spark.graph import PropertyGraph

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 4)] + [(9, i) for i in range(1, 4)], ["src", "dst"]
    )
    nodes = edges.select("src").union(edges.select("dst")).distinct().toDF("id")
    eng = JasmineEngine(spark)
    eng.catalog.register(PropertyGraph(nodes=nodes, edges=edges, name="g"))
    top = eng.predict_links("g", top_k=3)
    assert top.count() == 3
    assert top.columns == ["a", "b", "common_neighbors", "jaccard"]


def test_constructkg_against_reference_gold(spark):
    """Grade the deterministic entity extractor against the reference's
    graphRAG gold document (tests/integration/graphRAG/KG/gold/radio_city):
    recall over hand-annotated sentence-level facts, precision as the
    share of extracted triples matching some gold fact, and the gold QA
    pair (CEO of Radio City → Abraham Thomas) must be answerable from the
    extracted graph."""
    import json
    import os

    from jasminegraph_spark.pipeline import extract_entity_triples

    gold_dir = "/root/reference/tests/integration/graphRAG/KG/gold/radio_city"
    text = open(f"{gold_dir}/text.txt").read()
    lines = [
        line.strip()
        for line in text.splitlines()
        if line.strip() and not line.startswith("#")
    ]
    docs = spark.createDataFrame(list(enumerate(lines)), ["doc_id", "text"])
    triples = [
        f"{r.s} {r.p} {r.o}".lower() for r in extract_entity_triples(docs).collect()
    ]
    assert triples, "extractor found nothing in the gold document"

    gold = json.load(
        open(os.path.join(os.path.dirname(__file__), "fixtures", "radio_city_gold.json"))
    )

    def recovered(key_terms):
        return any(all(term in t for term in key_terms) for t in triples)

    hits = sum(1 for f in gold["facts"] if recovered(f["key_terms"]))
    recall = hits / len(gold["facts"])
    matched = sum(
        1
        for t in triples
        if any(all(term in t for term in f["key_terms"]) for f in gold["facts"])
    )
    precision = matched / len(triples)
    assert recall >= 0.75, f"gold-fact recall {recall:.2f} below floor"
    assert precision >= 0.5, f"gold-topic precision {precision:.2f} below floor"
    # the reference's QA pair is answerable from the extraction
    assert recovered(gold["qa_pair"]["key_terms"])


def test_llm_extractor_unreachable_endpoint_fails_loudly(spark):
    # the seam is a real HTTP-batch operator now (r5) — full e2e coverage
    # incl. retry/backoff lives in tests/test_llm_extractor.py; here:
    # an unreachable endpoint must surface after retries, not hang or
    # silently drop documents
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(Exception):
        llm_extractor(
            docs, "http://127.0.0.1:9", max_retries=1, timeout=2.0
        ).collect()


@pytest.mark.sweep  # r14: multi-minute quality/property row -> sweep tier (see pyproject)
def test_sage_sampled_encoder_trains_and_caps_neighbors(spark):
    """r7: the sampled-neighborhood SAGE variant (the reference's [10, 5]
    fan-out sampler, supervised.py:41-212). (a) sampling truly caps the
    layer aggregation: on a star graph the hub's layer-1 mean over
    sample=[2, 2] differs from the exact mean unless the draw picked the
    identical 2 of 40 spokes with distinct features; (b) the trained
    head with encoder='sage_sampled' still beats the raw Jaccard
    baseline on cora (sampling loses a little signal vs exact means but
    must keep the model usable)."""
    from pyspark.sql import functions as F

    from jasminegraph_spark.analytics import (
        auc,
        sage_embeddings,
        train_link_predictor,
    )

    # (a) hub capping: star 0—{1..40} plus a chain among spokes so spoke
    # degrees (hence features) vary
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 41)] + [(i, i + 1) for i in range(1, 20)],
        ["src", "dst"],
    )
    exact = {r["v"]: r["l1_f1"] for r in sage_embeddings(edges, layers=1).collect()}
    capped = {
        r["v"]: r["l1_f1"]
        for r in sage_embeddings(edges, layers=1, sample=[2]).collect()
    }
    assert set(capped) == set(exact)
    assert capped[0] != exact[0]  # hub mean computed over 2, not 40 spokes
    # determinism of the draw
    again = {
        r["v"]: r["l1_f1"]
        for r in sage_embeddings(edges, layers=1, sample=[2]).collect()
    }
    assert again == capped

    # (b) end-to-end through the trained head on cora
    raw = spark.read.csv(
        "/root/reference/tests/integration/env_init/data/cora/cora.cites", sep="\t"
    ).toDF("src", "dst")
    cora = raw.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    _, scored = train_link_predictor(cora, encoder="sage_sampled")
    a = auc(scored.persist())
    assert a > 0.74, a
    scored.unpersist()

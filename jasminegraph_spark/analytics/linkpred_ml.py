"""Learned link prediction: the reference's `train` / `predict` / `merge`
surface (FrontEnd.cpp:321,333,319) re-expressed on Spark ML.

The reference trains a federated GraphSAGE link classifier per partition
(src_python/models/supervised.py:41-212: StellarGraph EdgeSplitter
positives/negatives, seeds pinned to 42, link_classification head; its
integration fixture is the cora citation graph) and merges worker models.
The Spark-first equivalent keeps the same experimental contract but swaps
the TensorFlow encoder for deterministic structural features and a Spark
ML LogisticRegression head:

 * 3-way hash split of the edge set (EdgeSplitter semantics): a feature
   graph the encoder sees, train example edges, test example edges —
   DISJOINT, so train and test positives are both absent from the feature
   graph and share one feature distribution.
 * negatives = hash-derangement non-edges, ~1 per positive (balanced
   classes, like EdgeSplitter's sampling).
 * pair features: common-neighbor count, Jaccard, Adamic–Adar, plus the
   symmetric |f_a − f_b| / f_a·f_b / f_a+f_b combinations of the
   structural embeddings (linkpred.node_embeddings) — the binary
   operators GraphSAGE link heads apply to endpoint encodings.
 * model = LogisticRegression (L-BFGS, fixed params — deterministic on
   identical input).

Scale notes: every step is joins/groupBys on vertex keys; the only
all-vertex ordering is the row_number indexing vertices for the
derangement — one |V|-row sort, same cost class as a groupBy on vertices.
Example frames are ~|E| rows, far smaller than the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jasminegraph_spark.analytics.graph_algs import canonical_undirected
from jasminegraph_spark.analytics.linkpred import node_embeddings
from jasminegraph_spark.cache import finalize

_FEATS = ("f1", "f2", "f3", "f4")


def three_way_edge_split(
    und: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Deterministic (feature_graph, train_pos, test_pos) split by the
    first hex char of md5(a|b): ≥'6' → feature graph (~62%), <'3' →
    train examples (~19%), else test examples (~19%). Engine-stable."""
    tagged = und.withColumn("_h", F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 1))
    feature_graph = tagged.filter(F.col("_h") >= "6").drop("_h")
    train_pos = tagged.filter(F.col("_h") < "3").drop("_h")
    test_pos = tagged.filter((F.col("_h") >= "3") & (F.col("_h") < "6")).drop("_h")
    return feature_graph, train_pos, test_pos


def negative_edges(
    und: DataFrame, n_per_vertex: int = 1, index_cap: int = 1 << 20
) -> DataFrame:
    """Deterministic non-edges, ~``n_per_vertex``·|V| of them: index
    vertices 0..n-1 by id order, pair index i with
    (i·2654435761 + salt) mod n for salt = 1..n_per_vertex (a Knuth-hash
    derangement family), canonicalize, and anti-join the real edge set.

    The dense index needs a global row_number window (one partition), so
    above ``index_cap`` vertices the universe is first thinned to ~cap by
    a deterministic md5-stride filter — negatives drawn from a vertex
    subsample are statistically equivalent for training, and the window
    stays bounded at any graph size. Below the cap (every test SF)
    behavior is bit-identical to the uncapped form."""
    verts = und.select(F.col("a").alias("v")).union(und.select("b")).distinct()
    n_all = verts.count()
    if n_all > index_cap:
        stride = -(-n_all // index_cap)
        verts = verts.filter(
            F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % stride
            == 0
        )
        n = verts.count()  # thinning changed the universe — recount
    else:
        n = n_all  # no thinning: reuse the one count, skip a second job
    w = Window.orderBy("v")
    idx = verts.withColumn("i", F.row_number().over(w) - 1)
    partner = idx.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(1, n_per_vertex + 1)]))
    ).withColumn("j", (F.col("i") * F.lit(2654435761) + F.col("salt")) % F.lit(n))
    paired = (
        partner.alias("l")
        .join(idx.alias("r"), F.col("l.j") == F.col("r.i"))
        .select(
            F.least("l.v", "r.v").alias("a"),
            F.greatest("l.v", "r.v").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return paired.join(und, ["a", "b"], "left_anti")


def _overlap_cn_aa(pairs_deg: DataFrame, adj: DataFrame, degw: DataFrame) -> DataFrame:
    """Common-neighbor count + Adamic–Adar for candidate pairs, enumerated
    from the LOWER-degree endpoint of each pair — the same degree-ordered
    armor as the triangle wedge join. Joining always on ``a`` fans out by
    deg(a), which on a power-law graph is a 10^5-degree hub often enough
    to spill unboundedly (observed: scale-21 R-MAT filled the disk);
    min(deg_a, deg_b) is small for the hub–leaf pairs that dominate.
    ``pairs_deg`` must carry (a, b, deg_a, deg_b); cn/aa are symmetric in
    the endpoints, so orientation never changes a value. Returns
    (a, b, cn, aa) for pairs with ≥1 common neighbor."""
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") <= F.col("b"))
    )
    oriented = pairs_deg.select(
        "a",
        "b",
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    return (
        oriented.join(adj.select(F.col("x").alias("lo"), "w"), "lo")
        .join(adj.select(F.col("x").alias("hi"), F.col("w")), ["hi", "w"], "left_semi")
        .join(degw, "w")
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("cn"),
            # Adamic–Adar: Σ 1/log deg(v) over common neighbors (deg-1
            # vertices get a tiny epsilon so log never hits 0)
            F.sum(1.0 / F.log(F.col("dw") + F.lit(1e-9))).alias("aa"),
        )
    )


def _pair_features(pairs: DataFrame, emb: DataFrame, feat_graph: DataFrame) -> DataFrame:
    """Pair features over the FEATURE graph only: neighborhood overlap
    (common-neighbor count, Jaccard, Adamic–Adar) plus the symmetric
    embedding combinations — order-invariant, so the a<b canonicalization
    never changes the vector. The embedding columns are whatever ``emb``
    carries beyond v (4 structural for the flat encoder, 16 multi-hop
    for the 2-layer SAGE encoder); f1 (= degree) must be among them for
    the Jaccard ratio."""
    feats = [c for c in emb.columns if c != "v"]
    adj = feat_graph.select(F.col("a").alias("x"), F.col("b").alias("w")).unionAll(
        feat_graph.select(F.col("b"), F.col("a"))
    )
    degw = adj.groupBy("w").agg(F.count("*").alias("dw"))
    pairs_deg = (
        pairs.select("a", "b")
        .join(degw.select(F.col("w").alias("a"), F.col("dw").alias("deg_a")), "a")
        .join(degw.select(F.col("w").alias("b"), F.col("dw").alias("deg_b")), "b")
    )
    overlap = _overlap_cn_aa(pairs_deg, adj, degw)
    ea = emb.select(F.col("v").alias("a"), *[F.col(f).alias(f"a_{f}") for f in feats])
    eb = emb.select(F.col("v").alias("b"), *[F.col(f).alias(f"b_{f}") for f in feats])
    out = (
        pairs.join(ea, "a")
        .join(eb, "b")
        .join(overlap, ["a", "b"], "left")
        .withColumn("cn", F.coalesce("cn", F.lit(0)).cast("double"))
        .withColumn("aa", F.coalesce("aa", F.lit(0.0)))
    )
    cols = [
        F.col("cn"),
        F.col("aa"),
        # f1 is the vertex degree in the feature graph → Jaccard ratio
        (F.col("cn") / (F.col("a_f1") + F.col("b_f1") - F.col("cn"))).alias("jac"),
    ]
    for f in feats:
        cols.append(F.abs(F.col(f"a_{f}") - F.col(f"b_{f}")).alias(f"d_{f}"))
        cols.append((F.col(f"a_{f}") * F.col(f"b_{f}")).alias(f"p_{f}"))
        cols.append((F.col(f"a_{f}") + F.col(f"b_{f}")).alias(f"s_{f}"))
    return out.select("a", "b", *cols)


FEATURE_COLS = ["cn", "aa", "jac"] + [
    f"{p}_{f}" for f in _FEATS for p in ("d", "p", "s")
]


def pair_feature_cols(emb: DataFrame) -> list:
    """Feature-column names _pair_features emits for this embedding frame
    (FEATURE_COLS is the flat-encoder special case)."""
    feats = [c for c in emb.columns if c != "v"]
    return ["cn", "aa", "jac"] + [f"{p}_{f}" for f in feats for p in ("d", "p", "s")]


def shard_id(n_workers: int):
    """Deterministic federated shard assignment for a canonical pair
    (a, b): the SECOND hex char of md5(a|b) mod n_workers (the first char
    is already spent on the train/test splits). Engine-stable and
    SQL-replicable — DuckDB computes the identical shard with
    strpos('0123456789abcdef', ...) — so the shard layout itself is
    oracle-checkable."""
    return (
        F.expr(
            "instr('0123456789abcdef', "
            "substring(md5(concat_ws('|', a, b)), 2, 1)) - 1"
        )
        % F.lit(n_workers)
    ).cast("int")


def link_example_features(
    edges: DataFrame,
    split: str = "test",
    n_per_vertex: int = 1,
    n_workers: int | None = None,
) -> DataFrame:
    """The deterministic, SQL-expressible slice of the train/predict/merge
    lifecycle: the ``split`` example pairs (3-way md5 edge split +
    hash-derangement negatives) with their neighborhood-overlap features
    over the FEATURE graph — common-neighbor count, Jaccard, Adamic–Adar.
    Everything upstream of the L-BFGS fit, so a DuckDB oracle can
    hash-match the split boundaries, the negative sampling, and the
    feature math; the fit itself keeps its AUC floor in pytest
    (tests/test_linkpred_kg.py). With ``n_workers`` set, adds the
    federated ``shard`` column (shard_id) the FedAvg trainer partitions
    by. Returns (a, b, label, cn, jac, aa[, shard])."""
    und = canonical_undirected(edges)
    feat_graph, pos_train, pos_test = three_way_edge_split(und)
    neg = negative_edges(und, n_per_vertex=n_per_vertex)
    tagged = neg.withColumn("_h", F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 1))
    neg_train = tagged.filter(F.col("_h") < "8").drop("_h")
    neg_test = tagged.filter(F.col("_h") >= "8").drop("_h")
    pos, negx = (pos_train, neg_train) if split == "train" else (pos_test, neg_test)
    pairs = pos.withColumn("label", F.lit(1)).unionByName(
        negx.withColumn("label", F.lit(0))
    )
    adj = feat_graph.select(F.col("a").alias("x"), F.col("b").alias("w")).unionAll(
        feat_graph.select(F.col("b"), F.col("a"))
    )
    degw = adj.groupBy("w").agg(F.count("*").alias("dw"))
    da = degw.select(F.col("w").alias("a"), F.col("dw").alias("deg_a"))
    db = degw.select(F.col("w").alias("b"), F.col("dw").alias("deg_b"))
    # inner degree joins: endpoints must sit in the feature graph —
    # the same filter _pair_features applies via its inner emb join
    pairs_deg = pairs.join(da, "a").join(db, "b")
    overlap = _overlap_cn_aa(pairs_deg, adj, degw)
    out = (
        pairs_deg.join(overlap, ["a", "b"], "left")
        .withColumn("cn", F.coalesce("cn", F.lit(0)).cast("long"))
        .withColumn("aa", F.coalesce("aa", F.lit(0.0)))
    )
    res = out.select(
        "a",
        "b",
        F.col("label").cast("int").alias("label"),
        "cn",
        F.round(
            F.col("cn") / (F.col("deg_a") + F.col("deg_b") - F.col("cn")), 6
        ).alias("jac"),
        F.round("aa", 6).alias("aa"),
    )
    if n_workers:
        res = res.withColumn("shard", shard_id(n_workers))
    return res.orderBy("a", "b")


def _prepare_examples(edges: DataFrame, encoder: str = "flat"):
    """Shared example-building pipeline for the global and federated
    trainers: 3-way split, node embeddings (``encoder``: 'flat' = the
    1-hop structural degree profile, 'sage' = the 2-layer mean-aggregator
    GraphSAGE encoder — both computed on the FEATURE graph only, so no
    example edge leaks into its own representation), balanced negatives,
    assembled feature vectors. Returns (train_df, test_df, caches) with
    train_df persisted and every cached intermediate in ``caches`` for
    the caller's finalize()."""
    from pyspark.ml.feature import VectorAssembler

    from jasminegraph_spark.analytics.linkpred import sage_embeddings

    und = canonical_undirected(edges).persist()
    feat_graph, pos_train, pos_test = three_way_edge_split(und)
    feat_graph = feat_graph.persist()
    encode = {
        "flat": node_embeddings,
        "sage": sage_embeddings,
        # the reference's [10, 5] fan-out sampler (supervised.py:41-212),
        # deterministic xxhash64 draw — r7
        "sage_sampled": lambda e: sage_embeddings(e, sample=[10, 5]),
    }[encoder]
    emb = encode(
        feat_graph.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).persist()
    # class balance: roughly one negative per positive (the negatives are
    # split ~50/50 so each side matches its positive count)
    n_pos = und.count()
    n_vert = und.select("a").union(und.select("b")).distinct().count()
    neg = negative_edges(und, n_per_vertex=max(1, round(0.4 * n_pos / max(n_vert, 1))))
    tagged = neg.withColumn(
        "_h", F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 1)
    )
    neg_train = tagged.filter(F.col("_h") < "8").drop("_h")
    neg_test = tagged.filter(F.col("_h") >= "8").drop("_h")

    def labelled(pos, negf):
        return pos.withColumn("label", F.lit(1.0)).unionByName(
            negf.withColumn("label", F.lit(0.0))
        )

    asm = VectorAssembler(inputCols=pair_feature_cols(emb), outputCol="features")

    def prep(pairs):
        joined = _pair_features(pairs.select("a", "b"), emb, feat_graph).join(
            pairs.select("a", "b", "label"), ["a", "b"]
        )
        return asm.transform(joined)

    # the example frame is ~|E| rows — tiny next to the graph. Coalesce so
    # the ~25 L-BFGS treeAggregate rounds don't pay 32-task scheduling
    # overhead per iteration (at 100 TB the example frame is still ≪ |E|;
    # scale the partition count with its size, not the graph's)
    train_df = prep(labelled(pos_train, neg_train)).coalesce(8).persist()
    test_df = prep(labelled(pos_test, neg_test))
    return train_df, test_df, (und, feat_graph, emb, train_df)


def train_link_predictor(
    edges: DataFrame,
    reg_param: float = 0.01,
    max_iter: int = 25,
    encoder: str = "flat",
):
    # 25 L-BFGS iterations: measured identical test AUC to 100 on the cora
    # fixture (converges far earlier) at half the wall-clock
    """Train the seeded logistic link classifier. Returns (model,
    test_scored) where test_scored has (a, b, label, score, jac) for the
    held-out pos/neg pairs — AUC-compare `score` (learned) against `jac`
    (the raw heuristic on the same feature graph). ``encoder='sage'``
    swaps the 1-hop structural profile for the 2-layer mean-aggregator
    GraphSAGE representation (linkpred.sage_embeddings) — the reference's
    model family, trained through the same deterministic head."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array

    train_df, test_df, caches = _prepare_examples(edges, encoder=encoder)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(train_df)
    get_p1 = F.element_at(vector_to_array(F.col("probability")), 2)  # P(label=1)
    scored = model.transform(test_df).select(
        "a",
        "b",
        F.col("label").cast("int").alias("label"),
        get_p1.alias("score"),
        "jac",  # kept so callers can AUC-compare against the raw heuristic
    )
    return model, finalize(scored, *caches)


def federated_train_merge(
    edges: DataFrame,
    n_workers: int = 4,
    reg_param: float = 0.01,
    max_iter: int = 25,
    encoder: str = "flat",
):
    """The reference's federated `merge` verb (fl_server/fl_client: each
    worker trains GraphSAGE on its partition, the server merges weights):
    hash-partition the training examples into ``n_workers`` disjoint
    shards, fit one seeded logistic head per shard — each fit sees ONLY
    its shard, the federated setting — then FedAvg the coefficient
    vectors (shard-size-weighted) into one merged model.

    The merged model is served as a pure Catalyst sigmoid expression over
    the raw feature columns (Spark ML returns coefficients on the
    original scale even with standardization) — no model object, so the
    merged weights travel as 16 literals, exactly like the reference
    shipping merged weights back to workers.

    Returns (coefficients, intercept, test_scored) with test_scored =
    (a, b, label, score, jac). At cluster scale each shard fit is its own
    distributed L-BFGS; the merge itself is O(n_features) on the driver.
    """
    from pyspark.ml.classification import LogisticRegression

    train_df, test_df, caches = _prepare_examples(edges, encoder=encoder)
    fcols = pair_feature_cols(caches[2])  # caches = (und, feat_graph, emb, ...)
    part = train_df.withColumn("_w", shard_id(n_workers)).persist()
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    fits = []  # (shard_size, coefficient_array, intercept)
    for w in range(n_workers):
        shard = part.filter(F.col("_w") == w)
        n = shard.count()
        if n == 0:
            continue
        m = lr.fit(shard)
        fits.append((n, m.coefficients.toArray(), float(m.intercept)))
    if not fits:
        raise ValueError(
            "federated_train_merge: every shard is empty (no training "
            "examples — trivial or empty edge input)"
        )
    total = sum(n for n, _, _ in fits)
    coefficients = [
        float(sum(n * c[i] for n, c, _ in fits)) / total
        for i in range(len(fcols))
    ]
    intercept = float(sum(n * b for n, _, b in fits)) / total
    z = F.lit(intercept)
    for cname, cval in zip(fcols, coefficients):
        z = z + F.lit(cval) * F.col(cname)
    scored = test_df.select(
        "a",
        "b",
        F.col("label").cast("int").alias("label"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
        "jac",
    )
    return coefficients, intercept, finalize(scored, *caches, part)


def link_prediction_trained(edges: DataFrame, top_k: int = 100) -> DataFrame:
    """The `predict` surface end-to-end: train the seeded classifier, score
    the held-out pos/neg pairs, return the top-``top_k`` by learned score
    (ties → a, b). Columns (a, b, label, score_r) with score rounded to 4
    — ranking output, compared rows-only by the driver (training is not
    SQL-expressible)."""
    _, scored = train_link_predictor(edges)
    return (
        scored.select("a", "b", "label", F.round("score", 4).alias("score_r"))
        .orderBy(F.desc("score_r"), F.asc("a"), F.asc("b"))
        .limit(top_k)
    )


def auc(scored: DataFrame, score_col: str = "score") -> float:
    """Area under the ROC curve of (label, score) via Spark ML's evaluator
    (a plain double score column is a valid rawPrediction)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    ev = BinaryClassificationEvaluator(
        rawPredictionCol=score_col, labelCol="label", metricName="areaUnderROC"
    )
    return float(
        ev.evaluate(
            scored.withColumn("label", F.col("label").cast("double")).withColumn(
                score_col, F.col(score_col).cast("double")
            )
        )
    )

"""Deterministic split/sampling invariants (pipeline.sampling) and
sequence-packing/filter-funnel semantics (pipeline.packing)."""

from pyspark.sql import functions as F

from jasminegraph_spark.pipeline import hash_split, stratified_sample


def test_pack_sequences_budget_semantics(spark):
    from jasminegraph_spark.pipeline import pack_sequences

    # docs of 3 tokens each, budget 7; identical text → one shard; cum
    # sums 3,6,9,12,15,18 → pack_id = floor((cum-3)/7) = 0,0,0,1,1,2
    docs = spark.createDataFrame(
        [(i, "tok tok tok", "en") for i in range(6)], ["doc_id", "text", "lang"]
    )
    by_doc = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(docs, token_budget=7).collect()
    }
    assert [by_doc[i] for i in range(6)] == [0, 0, 0, 1, 1, 2]
    # an oversized doc occupies its own pack; the next doc (same md5
    # shard 'd', chosen deliberately) starts a new one
    big = spark.createDataFrame(
        [(0, " ".join(["t"] * 20), "en"), (1, "w9 z", "en")],
        ["doc_id", "text", "lang"],
    )
    packs = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(big, token_budget=7).collect()
    }
    assert packs[0] == 0 and packs[1] >= 1


def test_quality_filter_chain_reason_order(spark):
    from jasminegraph_spark.pipeline import quality_filter_chain

    docs = spark.createDataFrame(
        [
            (0, "one two three four five six", "en"),  # keep
            (1, "a b", "en"),                          # too_short
            (2, "x x x", "zz"),                        # bad_lang wins over low_ttr
            (3, "w w w w w w w w", "en"),              # low_ttr (ttr = 1/8)
        ],
        ["doc_id", "text", "lang"],
    )
    got = {r["reason"]: r["n_docs"] for r in quality_filter_chain(docs).collect()}
    assert got == {"keep": 1, "too_short": 1, "bad_lang": 1, "low_ttr": 1}


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"document number {i} body", "en" if i % 4 else "de") for i in range(n)],
        "doc_id: long, text: string, lang: string",
    )


def test_hash_split_partitions_everything(spark):
    df = hash_split(_docs(spark), key_col="text")
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 400
    assert set(counts) == {"train", "val", "test"}
    # roughly 80/10/10 (binomial tolerance on 400 docs)
    assert counts["train"] > 250 and counts["val"] < 100 and counts["test"] < 100


def test_hash_split_stable_and_content_keyed(spark):
    a = {(r["doc_id"], r["split"]) for r in hash_split(_docs(spark)).collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(_docs(spark).repartition(13).orderBy(F.rand(7))).collect()
    }
    assert a == b  # invariant to partitioning and order


def test_stratified_sample_respects_fractions(spark):
    docs = _docs(spark)
    out = stratified_sample(docs, "lang", {"en": 0.0}, default_fraction=1.0)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"de"}  # en fully dropped
    # sampled set is a subset of the corpus and deterministic
    s1 = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.3}).collect()}
    s2 = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.3}).collect()}
    assert s1 == s2
    assert len(s1) < 300  # only ~30% of en rows, de dropped (default 0)


def test_sample_monotone_in_fraction(spark):
    docs = _docs(spark)
    small = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.2, "de": 0.2}).collect()}
    big = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.6, "de": 0.6}).collect()}
    assert small <= big  # nested samples: raising the fraction only adds rows


# ---------------- KMV sketch + weighted sampling (round-4) ----------------


def test_kmv_distinct_exact_when_under_k(spark):
    # 50 distinct values with k=128: every hash is kept, the estimator
    # still lands near the true count (it IS (n-1)/max over all n mins)
    df = spark.range(50).select(F.col("id").cast("string").alias("v"))
    from jasminegraph_spark.pipeline import kmv_distinct

    r = kmv_distinct(df, "v", k=128).first()
    assert r["n_sampled"] == 50
    assert 25 <= r["est_distinct"] <= 100


def test_kmv_distinct_estimates_within_tolerance(spark):
    df = spark.range(10000).select(F.col("id").cast("string").alias("v"))
    from jasminegraph_spark.pipeline import kmv_distinct

    r = kmv_distinct(df, "v", k=256).first()
    assert r["n_sampled"] == 256
    # standard error of KMV ≈ n/sqrt(k-2): 10000/15.9 ≈ 628; allow 4σ
    assert abs(r["est_distinct"] - 10000) < 2600


def test_kmv_insensitive_to_duplication_and_partitioning(spark):
    from jasminegraph_spark.pipeline import kmv_distinct

    base = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    dup = base.unionAll(base).repartition(13)
    e1 = kmv_distinct(base, "v", k=64).first()["est_distinct"]
    e2 = kmv_distinct(dup, "v", k=64).first()["est_distinct"]
    assert e1 == e2  # pure function of the value SET


def test_weighted_sample_favors_heavy_rows(spark):
    from jasminegraph_spark.pipeline import weighted_sample

    # 200 light rows (w=1) + 20 heavy rows (w=1000): heavy rows should
    # dominate a k=20 sample
    rows = [(i, f"light-{i}", 1) for i in range(200)]
    rows += [(1000 + i, f"heavy-{i}", 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, w: long")
    out = weighted_sample(df, "w", k=20, key_col="text")
    got = [r["doc_id"] for r in out.collect()]
    heavy = sum(1 for d in got if d >= 1000)
    assert heavy >= 15


def test_weighted_sample_deterministic(spark):
    from jasminegraph_spark.pipeline import weighted_sample

    rows = [(i, f"doc {i}", (i % 7) + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, w: long")
    a = sorted(r["doc_id"] for r in weighted_sample(df, "w", k=10).collect())
    b = sorted(
        r["doc_id"] for r in weighted_sample(df.repartition(17), "w", k=10).collect()
    )
    assert a == b


def test_temperature_mixture_flattens_distribution(spark):
    """α=0.5 keeps everything in the smallest domain, downsamples the
    dominant one by ≈ sqrt(n_min/n_max), and α=1 is a no-op."""
    from jasminegraph_spark.pipeline import temperature_mixture

    rows = [(i, "big", f"text-{i}") for i in range(400)] + [
        (1000 + i, "small", f"rare-{i}") for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain", "text"])
    kept = temperature_mixture(df, "domain", alpha=0.5)
    counts = {r["domain"]: r["n"] for r in kept.groupBy("domain").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts["small"] == 25  # smallest domain never downsampled
    expect_big = 400 * (400 / 25) ** -0.5  # = 100
    assert abs(counts["big"] - expect_big) < 30  # hash-uniform tolerance
    noop = temperature_mixture(df, "domain", alpha=1.0)
    assert noop.count() == 425


def test_unigram_logprob_orders_quality(spark):
    """Docs of common tokens outscore docs of rare tokens; OOV tokens
    (beyond vocab_max) fall back to the 1/total floor."""
    import math

    from jasminegraph_spark.pipeline import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),           # only common tokens
            (2, "the zyzzyva"),               # one common + one rare
            (3, "zyzzyva"),                   # rare only
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"] > got[3]["avg_logprob"]
    total = 7
    assert abs(got[1]["avg_logprob"] - math.log(5 / total)) < 1e-9
    # vocab_max=1 keeps only 'the'; both rare tokens take the 1/total floor
    capped = {r["doc_id"]: r for r in unigram_logprob(docs, vocab_max=1).collect()}
    assert abs(capped[3]["avg_logprob"] - math.log(1 / total)) < 1e-9


def test_chunk_documents_windows(spark):
    """Chunk boundaries: overlap between consecutive windows, short docs
    produce exactly one chunk, the tail window is kept short, and
    re-joining step-strided chunks reconstructs the document."""
    import pytest

    from jasminegraph_spark.pipeline import chunk_documents

    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b"), (3, "x")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    # doc 1: 10 tokens, step 2 → ceil((10-2)/2) = 4 chunks
    assert [rows[(1, i)][0] for i in range(4)] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    assert rows[(1, 3)][1] == 4
    assert rows[(2, 0)] == ("a b", 2) and (2, 1) not in rows
    assert rows[(3, 0)] == ("x", 1)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_bm25_ranking_properties(spark):
    """BM25 sanity on a crafted corpus: the doc containing BOTH query
    terms outranks single-term docs; a rarer term outweighs a common
    one; non-matching docs are absent; empty query raises."""
    import pytest

    from jasminegraph_spark.pipeline import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark engine spark engine plan"),
            (2, "spark plan optimizer cost model"),
            (3, "engine room crew deck sail"),
            (4, "totally unrelated words here now"),
            (5, "spark spark spark spark spark"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, ["spark", "engine"], k=10).collect()
    ranks = [r["doc_id"] for r in out]
    assert 4 not in ranks
    assert ranks[0] == 1  # both terms, engine is rarer
    both = {r["doc_id"]: r["n_matched"] for r in out}
    assert both[1] == 2 and both[5] == 1
    # engine (df=2) carries more idf than spark (df=3): doc 3 beats doc 2
    assert ranks.index(3) < ranks.index(2)
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_vocab_coverage_curve(spark):
    """Coverage is monotone, ends at 1.0 when top_v >= vocab, and ranks
    by frequency with alphabetical tie-break."""
    from jasminegraph_spark.pipeline import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], ["doc_id", "text"]
    )
    rows = vocab_coverage(docs, top_v=10).orderBy("rank").collect()
    assert [r["token"] for r in rows] == ["a", "b", "c", "z"]
    assert [r["n_occurrences"] for r in rows] == [4, 3, 1, 1]
    covs = [r["cum_coverage"] for r in rows]
    assert all(x < y or abs(x - y) < 1e-12 for x, y in zip(covs, covs[1:]))
    assert abs(covs[-1] - 1.0) < 1e-12


def test_scd2_semantics(spark):
    """SCD2 via the registered driver query semantics: consecutive same-
    state events collapse; state flips open new versions; the last
    version per user is current."""
    import datetime as dt

    import __spark_entry__ as entry_mod

    # miniature events table written to a temp dir through the same path
    # is overkill here — exercise the window logic directly
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "browse", 1), (2, base + dt.timedelta(hours=1), "browse", 1),
        (3, base + dt.timedelta(hours=2), "purchase", 1),
        (4, base + dt.timedelta(hours=3), "browse", 1),
        (5, base, "click", 2),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "user_id"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    starts = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    versions = starts.select(
        "user_id", "event_type", "ts",
        F.lead("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id")).alias("vto"),
    ).collect()
    u1 = sorted([(r["event_type"], r["vto"] is None) for r in versions if r["user_id"] == 1])
    assert u1 == [("browse", False), ("browse", True), ("purchase", False)]
    assert [(r["event_type"], r["vto"] is None) for r in versions if r["user_id"] == 2] == [
        ("click", True)
    ]


def test_sampled_quantiles_deterministic_and_close(spark):
    """The hash sample is rerun-stable and its quantiles track the full
    data's within sampling error on a smooth distribution."""
    from jasminegraph_spark.pipeline import sampled_quantiles

    df = spark.range(10000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    a = sampled_quantiles(df, "v", key_col="k", sample_frac=0.2).collect()
    b = sampled_quantiles(df, "v", key_col="k", sample_frac=0.2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    got = {r["quantile"]: r["value"] for r in a}
    for q, v in got.items():
        assert abs(v - q * 9999) < 400  # ~uniform: quantile ≈ q·max
    n = a[0]["n_sampled"]
    assert 1600 < n < 2400  # ≈ 20% of 10k


def test_kmv_sketch_merge_exact(spark):
    """Merging per-nation KMV sketches reproduces EXACTLY the sketch a
    direct pass over the merged values builds (union-of-k-mins is
    lossless for k-min sketches), and estimates are within KMV error."""
    from pyspark.sql import functions as F

    from jasminegraph_spark.pipeline import kmv_merge_sketches, kmv_sketch_by

    rows = [(f"n{i % 5}", f"r{i % 2}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, ["nation", "region", "val"])
    per_nation = kmv_sketch_by(df, "val", ["nation", "region"], k=32)
    merged = kmv_merge_sketches(per_nation, ["region"], k=32)
    direct = kmv_sketch_by(df, "val", ["region"], k=32)
    m = {r["region"]: list(r["sketch"]) for r in merged.collect()}
    d = {r["region"]: list(r["sketch"]) for r in direct.collect()}
    assert m == d  # merge is exact, not approximate
    for r in direct.collect():
        true = 1000  # each region holds 1000 distinct vals
        assert abs(r["est_distinct"] - true) / true < 0.5  # k=32 → ~18% σ


def test_kmv_sketch_unsaturated_estimate_is_exact(spark):
    """Below saturation the sketch holds EVERY distinct hash, so
    est_distinct must be the exact count n_kept, not (k-1)/h_k
    (ADVICE r5 #5) — including the 1-distinct-value degenerate group."""
    from jasminegraph_spark.pipeline import kmv_merge_sketches, kmv_sketch_by

    rows = [("a", i % 7) for i in range(100)] + [("b", 42)] * 10
    df = spark.createDataFrame(rows, ["g", "val"])
    out = {r["g"]: r for r in kmv_sketch_by(df, "val", ["g"], k=64).collect()}
    assert out["a"]["est_distinct"] == 7.0
    assert out["b"]["est_distinct"] == 1.0
    # merge side mirrors the rule
    sk = kmv_sketch_by(df.withColumn("r", df.g), "val", ["g", "r"], k=64)
    merged = {r["g"]: r for r in kmv_merge_sketches(sk, ["g"], k=64).collect()}
    assert merged["a"]["est_distinct"] == 7.0
    assert merged["b"]["est_distinct"] == 1.0


def test_kmv_sketch_two_stage_prefilter_in_plan(spark):
    """The per-group top-k must be TWO-STAGE (first window partitioned by
    (group, spark_partition_id) — VERDICT r5 #5): no sort ever sees a
    whole group's distinct-hash set. Assert the partition-id window
    exists in the plan and that results equal the direct build."""
    from jasminegraph_spark.pipeline import kmv_sketch_by

    rows = [(f"g{i % 3}", i) for i in range(5000)]
    df = spark.createDataFrame(rows, ["g", "val"]).repartition(8)
    sk = kmv_sketch_by(df, "val", ["g"], k=16)
    plan = sk._jdf.queryExecution().optimizedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    assert plan.count("Window") >= 2  # stage-1 prefilter + stage-2 final
    # the stage-1 window must partition on the partition id, not group alone
    w1 = [ln for ln in plan.splitlines() if "Window" in ln and "__pid" in ln]
    assert w1, "stage-1 window does not key on spark_partition_id"
    # correctness: identical to a literal single-stage top-k in pandas
    import hashlib

    def h(v):
        x = int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) / float(16**12)
        return x

    expected = {}
    for g in ("g0", "g1", "g2"):
        hs = sorted({h(v) for gg, v in rows if gg == g if h(v) > 0})[:16]
        expected[g] = [round(x, 9) for x in hs]
    got = {r["g"]: [round(x, 9) for x in r["sketch"]] for r in sk.collect()}
    assert got == expected

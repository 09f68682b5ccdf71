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

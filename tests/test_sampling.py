"""Deterministic split/sampling invariants (pipeline.sampling)."""

from pyspark.sql import functions as F

from jasminegraph_spark.pipeline import hash_split, stratified_sample


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

"""End-to-end training-data pipeline: the full corpus funnel chained the
way a real data team runs it — each stage feeds the next, and the counts
must stay consistent (no silent row loss anywhere).

    raw docs → line-level dedup → exact+near corpus dedup →
    quality filter (attrition report) → temperature mixture →
    train/val/test split → sequence packing
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.mark.sweep  # r14: multi-minute quality/property row -> sweep tier (see pyproject)
def test_full_corpus_funnel(spark, docs):
    from jasminegraph_spark.pipeline import (
        dedup_corpus,
        hash_split,
        line_dedup,
        pack_sequences,
        quality_filter_chain,
        temperature_mixture,
    )

    n0 = docs.count()

    # 1. line-level boilerplate removal — every doc keeps a row
    lined = line_dedup(docs, min_docs=2)
    assert lined.count() == n0
    cleaned = (
        lined.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .filter(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"), "lang", "source")
    )
    n1 = cleaned.count()
    assert 0 < n1 <= n0

    # 2. exact + near-dup corpus dedup → survivors
    survivors = dedup_corpus(cleaned).persist()
    n2 = survivors.count()
    assert 0 < n2 <= n1

    # 3. attrition report sums exactly to the dedup survivors
    funnel = quality_filter_chain(
        survivors, min_tokens=5, max_tokens=5000, min_ttr=0.05,
        allowed_langs=("en", "fr", "de", "es", "zh"),
    )
    reasons = {r["reason"]: r["n_docs"] for r in funnel.collect()}
    assert sum(reasons.values()) == n2

    # the kept subset (same predicate the funnel attributes by)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    keep = (
        F.col("lang").isin("en", "fr", "de", "es", "zh")
        & (F.size(toks) >= 5)
        & (F.size(toks) <= 5000)
        & (F.size(F.array_distinct(toks)) / F.size(toks) >= 0.05)
    )
    kept = survivors.filter(keep).persist()
    n3 = kept.count()
    assert n3 == reasons.get("keep", 0)

    # 4. language rebalancing — the smallest language is never downsampled
    mixed = temperature_mixture(kept, "lang", alpha=0.5).persist()
    n4 = mixed.count()
    assert 0 < n4 <= n3
    before = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    after = {r["lang"]: r["n"] for r in mixed.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    min_lang = min(before, key=lambda l: (before[l], l))
    assert after[min_lang] == before[min_lang]

    # 5. content-hash split partitions the mixture exactly
    split = hash_split(mixed, key_col="text")
    per = {r["split"]: r["n"] for r in split.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert sum(per.values()) == n4
    assert per.get("train", 0) > per.get("val", 0)

    # 6. sequence packing on the train split loses nothing
    train = split.filter(F.col("split") == "train")
    packed = pack_sequences(train, token_budget=512, group_col="lang")
    assert packed.count() == train.count()
    n_packs = packed.select("grp", "shard", "pack_id").distinct().count()
    assert 0 < n_packs <= packed.count()
    for df in (survivors, kept, mixed):
        df.unpersist()

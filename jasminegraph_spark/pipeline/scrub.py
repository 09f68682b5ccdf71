"""Corpus scrubbing operators for training-data pipelines: PII redaction,
benchmark decontamination, TF-IDF keyword extraction.

All pure Catalyst expressions (regexp_replace / regexp_count / explode /
window) — JVM-side, whole-stage-codegen, no Python in the hot path. The
regex dialect is restricted to the RE2 ∩ java.util.regex intersection so
the DuckDB oracles mirror each pattern verbatim.

Reference parity: the reference has no scrubbing surface — these extend
its ingest pipeline (SURVEY.md §2.4) with the operators a 100 TB
pretraining corpus build needs before graph/KG construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Patterns are anchored on \b and use only RE2-safe constructs (no
# lookaround, no backrefs) so Spark (java.util.regex) and DuckDB (RE2)
# match identically. Order matters: email before ipv4 keeps "a@1.2.3.4"
# redacting as one EMAIL, not an EMAIL prefix + IP suffix.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact PII spans with typed placeholders, counting hits per type.

    Returns (doc_id, redacted_text, n_email, n_ssn, n_phone, n_ipv4,
    n_redactions). A single projection: each pattern is one regexp_count
    plus one regexp_replace, chained — no shuffle at all; at 100 TB this
    is a pure map stage that pipelines into whatever scan feeds it.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx)).alias(f"n_{name}")
        for name, rx in PII_PATTERNS
    ]
    redacted = F.col(text_col)
    for name, rx in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, rx, f"<{name.upper()}>")
    out = docs.select(
        F.col(id_col).alias("doc_id"), redacted.alias("redacted_text"), *counts
    )
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_redactions", total)


def token_ngrams(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Lowercased word n-grams per document: (doc_id, ngram), distinct.

    tokens = alnum runs of the lowercased text; n-grams are space-joined
    windows. Pure expressions (regexp_extract_all → sequence → transform →
    explode); distinct is one partial-aggregated shuffle on (doc_id,ngram).
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    # guard BEFORE sequence(): Spark's sequence(1, stop) with stop < 1
    # generates a DESCENDING run (e.g. [1, 0]), not an empty array — docs
    # shorter than n tokens must drop out up front
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return (
        docs.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("ngram"))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    ``n``-gram with a held-out benchmark set (the standard pretraining
    hygiene check — e.g. GPT-3 appendix C / PaLM used 8-13-gram overlap).

    Returns (doc_id, n_hit_ngrams) for contaminated train docs only.

    Scale shape: the benchmark side is small (eval sets are KBs-MBs, the
    corpus is TBs) — its distinct n-gram set builds once and the overlap
    is an equi-join on the ngram hash that BROADCASTS; the train side
    never shuffles. Counting distinct hit-grams per doc is then one
    partial-agg groupBy on doc_id.
    """
    train_g = token_ngrams(train, n, id_col, text_col)
    bench_g = token_ngrams(benchmark, n, id_col, text_col).select("ngram").distinct()
    return (
        train_g.join(F.broadcast(bench_g), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` keywords per document by smoothed TF-IDF:
    score = tf * (ln((N + 1) / (df + 1)) + 1).

    Returns (doc_id, term, tf, df, score) with rank ≤ k per doc, ties on
    score broken by term ascending (deterministic across engines).

    Plan: one explode + one (doc,term) groupBy for tf; df reuses the same
    frame with a term-level groupBy; N is a scalar 1-row broadcast. The
    per-doc top-k is a rank window partitioned BY DOC — thousands of
    small partitions, no global sort, no skew (doc vocabulary is bounded).
    """
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )

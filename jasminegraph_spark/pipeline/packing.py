"""Sequence packing and quality-filter funnel for LLM training corpora.

Two operators a 100 TB training-data pipeline runs after dedup/quality
scoring (beyond the reference's surface — SURVEY §2 'LLM-pipeline
operators'):

 * :func:`pack_sequences` — context-window packing: stream documents into
   fixed token-budget packs (the preprocessing step that turns documents
   into fixed-length training sequences). Deterministic chunk-by-running-
   sum packing within (group, shard) streams: shard = md5 hex prefix of
   the text, so the global window sort a naive cumsum would need becomes
   |groups|·16 independent window partitions — each bounded, no single-
   partition sort at scale.
 * :func:`quality_filter_chain` — the keep/drop funnel (length bounds,
   type-token-ratio floor, language allowlist) with FIRST-failing-reason
   attribution, so corpus attrition is explainable per rule (what data
   teams actually audit).

Both are pure Catalyst expressions + one partitioned window / groupBy —
no UDFs, shuffle keyed on (group, shard) or the reason code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 512,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document a (group, shard, pack_id): documents stream
    in ``id_col`` order within each (group, md5-shard) partition and a
    pack closes when the running token sum passes ``token_budget``
    (pack_id = floor((cumsum − n_tokens)/budget) — each pack starts below
    a budget boundary; oversized single documents occupy their own pack).
    Returns (group, shard, pack_id, doc_id, n_tokens)."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = docs.select(
        F.col(group_col).alias("grp"),
        F.substring(F.md5(F.col(text_col)), 1, 1).alias("shard"),
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
    )
    w = Window.partitionBy("grp", "shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    return base.withColumn(
        "pack_id", F.floor((cum - F.col("n_tokens")) / F.lit(token_budget))
    )


def packing_stats(
    docs: DataFrame, token_budget: int = 512, **kw
) -> DataFrame:
    """Per-group packing summary: number of packs, documents, tokens and
    mean fill ratio vs the budget. Returns (grp, n_packs, n_docs,
    total_tokens, fill_ratio%.6f-string — engine-portable)."""
    packed = pack_sequences(docs, token_budget=token_budget, **kw)
    return (
        packed.groupBy("grp")
        .agg(
            F.countDistinct("shard", "pack_id").alias("n_packs"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "grp",
            "n_packs",
            "n_docs",
            "total_tokens",
            F.format_string(
                "%.6f",
                F.col("total_tokens")
                / (F.col("n_packs") * F.lit(float(token_budget))),
            ).alias("fill_ratio"),
        )
        .orderBy("grp")
    )


def quality_filter_chain(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 5000,
    min_ttr: float = 0.3,
    allowed_langs: tuple = ("en", "de", "fr"),
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Corpus filter funnel with first-failing-reason attribution:
    bad_lang → too_short → too_long → low_ttr → keep (rule order is the
    audit order). Returns one row per reason: (reason, n_docs,
    total_tokens) — the attrition report."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    reason = (
        F.when(~F.col(lang_col).isin(*allowed_langs), "bad_lang")
        .when(n_tok < min_tokens, "too_short")
        .when(n_tok > max_tokens, "too_long")
        .when(ttr < min_ttr, "low_ttr")
        .otherwise("keep")
    )
    return (
        docs.select(reason.alias("reason"), n_tok.alias("n_tokens"))
        .groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("reason")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / long-context prep
    twin of pack_sequences): each document becomes ceil((n - overlap) /
    step) windows of ``chunk_tokens`` whitespace tokens advancing by
    step = chunk_tokens - overlap; the final window keeps the tail even
    when short. Entirely map-side (split → sequence → slice → explode):
    no shuffle, no UDF — chunking 100 TB is exactly one scan.

    Returns (id_col, chunk_id, chunk_text, n_tokens) with chunk_id the
    0-based window index.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # windows fully covering the doc: ceil(max(n - overlap, 1) / step)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(toks, i * F.lit(step) + F.lit(1), F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
            F.least(n - i * F.lit(step), F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return docs.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").cast("int").alias("chunk_id"),
        "c.chunk_text",
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
    )

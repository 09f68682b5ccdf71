"""Distributed BPE vocabulary induction (Sennrich et al., ACL 2016).

The reference ships no tokenizer training; a 100 TB training-data
pipeline needs one, and the merge loop maps cleanly onto Spark: the
corpus collapses to a (distinct word, frequency) table after one
aggregation, every merge round is one explode + partial-agg groupBy for
the pair counts, and the chosen merge is APPLIED with a single string
``replace`` over a DOUBLE-space-delimited symbol form: the pattern
``' l  r '`` consumes one space from each flanking boundary and the
replacement ``' lr '`` restores them, so every boundary stays exactly
two spaces and left-to-right non-overlapping replacement reproduces
BPE's greedy merge order INCLUDING back-to-back runs (a single-space
form fails there: the consumed delimiter breaks the next adjacent
match). No UDF, no per-word Python; only the 1-row argmax per round
touches the driver.

Determinism: ties on pair count break lexicographically (left, right),
so the merge table is a pure function of the corpus — the DuckDB twin
unrolls the identical rounds and hash-matches it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jasminegraph_spark.cache import checkpoint


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(ws, cnt): distinct lowercase alnum words as padded DOUBLE-space
    joined character sequences ('  h  e  l  l  o  '), with corpus
    frequencies (see module docstring for why two spaces)."""
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    return words.select(
        F.concat(
            F.lit("  "), F.trim(F.regexp_replace("w", "(.)", "$1  ")), F.lit("  ")
        ).alias("ws"),
        "cnt",
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    batch_k: int = 1,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus. Returns
    a DataFrame (rank, left, right, freq): rank-th merge joined symbols
    ``left``+``right`` which co-occurred adjacently ``freq`` times
    (weighted by word frequency, overlaps counted as in the reference
    implementation). No end-of-word marker (documented divergence from
    Sennrich's '</w>'); single characters are the initial alphabet.

    ``batch_k`` is the SCALE path (r5 verdict #4): with batch_k=1
    (default) the loop is the literal Sennrich recurrence — one Spark
    job per merge, exactly what the pl_bpe_merges oracle unrolls. A real
    32k–100k vocab cannot afford 32k sequential driver round-trips, so
    batch_k>1 accepts up to K merges per round with pairwise-DISJOINT
    SYMBOL SUPPORT, chosen greedily down the (freq DESC, l, r) order
    from the round's top candidates: a pair is taken only if neither
    symbol — nor its merged form — collides with any symbol or merged
    form already taken this round. Disjoint support means the accepted
    merges commute (none can create/destroy an occurrence of another),
    so the batch is order-independent and deterministic, and EQUAL to
    the sequential loop whenever the top-K merges don't interact
    (property-tested in tests/test_pipeline_e2e.py); when they do
    interact, conflicting pairs are deferred to the next round's fresh
    counts — vocab quality is preserved, merge RANKS may legally differ
    from sequential BPE. Job count drops from n_merges to
    ~n_merges/batch_k (32k merges at K=256 → ~125 rounds; see SCALE.md
    §BPE)."""
    spark = docs.sparkSession
    words = _word_table(docs, text_col).transform(checkpoint)
    merges = []
    while len(merges) < n_merges:
        pairs = (
            words.select(
                F.explode(
                    # sequence(1, 0) is DESCENDING in Spark — guard the
                    # single-symbol words (no pairs) explicitly
                    F.expr(
                        "CASE WHEN size(split(trim(ws), '  ')) < 2 THEN"
                        " array() ELSE"
                        " transform(sequence(1, size(split(trim(ws), '  ')) - 1),"
                        " i -> struct(split(trim(ws), '  ')[i - 1] AS l,"
                        "             split(trim(ws), '  ')[i] AS r)) END"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("freq"))
        )
        want = min(batch_k, n_merges - len(merges))
        # over-fetch so conflicts don't starve the batch; 1 row when K=1
        top = (
            pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(want if want == 1 else max(4 * want, 16))
            .collect()
        )
        if not top:
            break
        taken: list = []
        used: set = set()
        for row in top:
            l, r = row["l"], row["r"]
            if l in used or r in used or (l + r) in used:
                continue  # interacts with a merge already taken this round
            taken.append((l, r, int(row["freq"])))
            used |= {l, r, l + r}
            if len(taken) == want:
                break
        ws_col = F.col("ws")
        for l, r, freq in taken:
            merges.append((len(merges) + 1, l, r, freq))
            ws_col = F.replace(ws_col, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
        words = words.select(ws_col.alias("ws"), "cnt").transform(checkpoint)
    return spark.createDataFrame(
        merges, "rank: int, left: string, right: string, freq: long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list: per document, token counts under the
    BPE vocabulary (rank-ordered replaces — the same greedy semantics
    training used). Returns (doc_id, n_bpe_tokens)."""
    ws = F.concat(
        F.lit("  "),
        F.trim(
            F.regexp_replace(
                F.concat_ws(
                    "      ",  # 6 spaces: word boundaries never pair-match
                    F.regexp_extract_all(
                        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
                    ),
                ),
                "([^ ])",
                "$1  ",
            )
        ),
        F.lit("  "),
    )
    for l, r in merges:
        ws = F.replace(ws, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    n = F.size(F.split(F.trim(ws), " +"))
    return docs.select(F.col(id_col).alias("doc_id"), n.alias("n_bpe_tokens"))

"""Text analysis operators for training-data pipelines.

Language ID (stopword-marker heuristic), quality scoring, token counting,
document fingerprinting (bottom-k sketch). All pure Catalyst expressions —
regexp/split/aggregate — so they run JVM-side inside whole-stage codegen;
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word regexes per language: crude but deterministic; the oracle
# mirrors them 1:1. \\b word boundaries keep counts substring-safe.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "es": r"\b(el|la|de|que|y)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|de|et|les)\b",
}


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + distinct-token count per doc."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """n-gram/stopword-marker language ID: count marker hits per language,
    argmax with deterministic tie-break on language code. Returns
    (doc_id, lang_pred, score)."""
    # array_max on struct compares field-by-field; ordering by
    # (score, -index) makes ties pick the alphabetically FIRST language
    indexed = F.array(
        *[
            F.struct(
                F.regexp_count(F.col(text_col), F.lit(rx)).alias("score"),
                F.lit(-i).alias("neg_idx"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, rx) in enumerate(sorted(LANG_MARKERS.items()))
        ]
    )
    best = F.array_max(indexed)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("score"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    length, token stats, type-token ratio, mean token length.
    score = ttr * 0.5 + min(n_tokens,100)/100 * 0.3 + min(mean_len,10)/10 * 0.2
    Ratios ship UNROUNDED: every term is IEEE-deterministic arithmetic on
    identical integer inputs, so the doubles are bit-identical across
    engines — while ROUND itself diverges on the half-way decimals these
    rationals frequently produce (denominators 2^a·5^b)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.length(F.trim(text_col)) - F.length(F.regexp_replace(F.trim(text_col), r"\s", ""))).alias(
            "n_spaces"
        ),
    )
    ttr = F.col("n_distinct") / F.col("n_tokens")
    mean_len = (F.col("n_chars") - F.col("n_spaces")) / F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        ttr.alias("ttr"),
        mean_len.alias("mean_token_len"),
        (
            ttr * 0.5
            + F.least(F.col("n_tokens"), F.lit(100)) / 100.0 * 0.3
            + F.least(mean_len, F.lit(10.0)) / 10.0 * 0.2
        ).alias("quality"),
    )


def doc_fingerprint(
    docs: DataFrame, k: int = 4, shingle_k: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Bottom-k sketch fingerprint: the k smallest distinct shingle digests,
    concatenated. Equal fingerprints ⇒ near-identical content; the sketch
    is also a fixed-size doc signature for downstream joins.
    Returns (doc_id, fingerprint)."""
    from jasminegraph_spark.pipeline.dedup import char_shingles

    sh = char_shingles(docs, shingle_k, id_col, distinct=False).withColumn(
        "h", F.md5("shingle")
    )  # collect_set dedups, so the shingle-distinct shuffle is skipped
    return sh.groupBy("doc_id").agg(
        F.concat_ws(",", F.slice(F.array_sort(F.collect_set("h")), 1, k)).alias("fingerprint")
    )


def embed_text(
    docs: DataFrame, dim: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic hashed-token text embedding (feature hashing): lowercase
    alnum tokens → md5-prefix bucket (first 4 hex chars mod ``dim``) →
    per-bucket term counts → L2-normalized double array.

    Closes the reference's text→embedding ingest surface
    (vectorstore/TextEmbedder.h:29-42 embeds node text before FAISS
    indexing) with an engine-portable featurizer: no model weights, the
    same vector from any engine/run/partitioning, so ANN / near-dup /
    beam-search run from raw text end-to-end and stay oracle-checkable.

    One explode + ONE partial-aggregated groupBy computing all ``dim``
    bucket counts as conditional sums (wide-column pattern, like simhash
    votes) — no per-bucket shuffle, no Python. Docs with zero tokens drop
    out (no embeddable content). Returns (doc_id, embedding array<double>).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("token"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("long"), F.lit(dim)
    )
    counts = tok.select("doc_id", bucket.alias("bucket"))
    wide = counts.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("bucket") == i, 1).otherwise(0)).cast("double").alias(f"c{i}")
            for i in range(dim)
        ]
    )
    vec = F.array(*[F.col(f"c{i}") for i in range(dim)])
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    return wide.select(
        "doc_id", F.transform(vec, lambda x: x / norm).alias("embedding")
    )


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition quality signals (the Gopher/MassiveText repetition
    rules, adapted to the token level): per document,

     * dup_bigram_frac — 1 − distinct/total word bigrams (templated or
       looping text scores high),
     * top_token_frac — the most frequent token's share of all tokens.

    The bigram fraction is pure array expressions (no shuffle); the top
    token needs one (doc, token) count — a single partial-agg shuffle.
    Returns (doc_id, n_tokens, dup_bigram_frac, top_token_frac) with the
    fractions as exact single-division doubles (engine-portable)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    base = docs.filter(F.size(toks) >= 2).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
        ).alias("dup_bigram_frac"),
    )
    top = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_token_frac"))
    )
    return base.join(top, "doc_id")


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_max: int = 1_000_000,
) -> DataFrame:
    """Perplexity-proxy quality score WITHOUT a model: the mean unigram
    log-probability of a document under the corpus's own unigram
    distribution (the KenLM-style filter's cheap cousin — documents of
    rare/garbled tokens score very negative, formulaic ones score high).

    Two passes: (1) token explode → corpus frequency table (bounded at
    ``vocab_max`` rows by frequency rank so the table stays joinable at
    any corpus size — out-of-vocab tokens fall back to probability
    1/total, i.e. the floor of the kept table); (2) re-join doc tokens to
    frequencies, average ln p per doc. The frequency table is tiny next
    to the corpus — Spark broadcasts it under AQE; the heavy side touches
    one explode + one hash join + one doc-keyed aggregation.

    Returns (doc_id, n_tokens, avg_logprob).
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    freqs = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_max)
    )
    total = toks.count()
    logp = freqs.select("tok", F.log(F.col("n") / F.lit(float(total))).alias("lp"))
    floor = F.log(F.lit(1.0 / float(total)))
    return (
        toks.join(logp, "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.coalesce("lp", floor)).alias("avg_logprob"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword retrieval: rank documents for a bag of query terms —
    the lexical half of a RAG retrieval stack (the dense half is the ANN
    family in pipeline/similarity).

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avg|d|))
        idf(t)   = ln( (N − df + 0.5) / (df + 0.5) + 1 )    (Lucene form)

    Plan: one token explode filtered TO THE QUERY TERMS at the scan
    (predicate pushdown keeps the explode output ∝ matches, not corpus
    tokens), one (term, doc) tf aggregation, a |terms|-row df/idf table
    broadcast back, a doc-length frame, and a per-doc sum + TakeOrdered
    top-k. No full-corpus inverted index is materialized — at 100 TB
    build the (term, doc, tf) table ONCE with the same first two stages
    and reuse it across queries (it IS the inverted index).

    Returns (id_col, n_matched, score) for the top k by (score, id).
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    lens = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtoks = toks.filter(F.col("tok").isin(list(query_terms)))
    tf = qtoks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").alias("n_matched"), F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def vocab_coverage(
    docs: DataFrame,
    top_v: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-prep vocabulary report: the ``top_v`` most frequent
    tokens with cumulative corpus coverage — the curve that decides a
    vocab size (where does coverage flatten?) before training a
    tokenizer.

    One token-explode count, then ranking + running coverage over the
    CANDIDATE table only (top_v rows after a TakeOrdered) — the
    single-partition cumsum window touches top_v rows no matter how
    large the corpus, so the bounded-window warning never applies to
    corpus-sized data. Returns (rank, token, n_occurrences,
    cum_coverage).
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total = toks.count()
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(top_v)
    w = Window.orderBy(F.desc("n"), F.asc("tok")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("tok")))
        .cast("int")
        .alias("rank"),
        F.col("tok").alias("token"),
        F.col("n").alias("n_occurrences"),
        (F.sum("n").over(w) / F.lit(float(total))).alias("cum_coverage"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple = GOPHER_STOPWORDS,
) -> DataFrame:
    """The full Gopher/MassiveText document-level rule filter (Rae et
    al. 2021, Appendix A) — the canonical pre-training quality gate,
    completing the repetition_scores signals:

     * word count in [50, 100k]; mean word length in [3, 10] chars
     * symbol-to-word ratio ('#'/'…') <= 0.1
     * <= 90% of lines bullet-started; <= 30% ellipsis-ended
     * >= 80% of words contain an alphabetic character
     * >= 2 of 8 canonical English stopwords present

    Every signal ships as an EXACT INTEGER COUNT and `passes` is derived
    with cross-multiplied integer comparisons (no division) — the frame
    is bit-identical across engines, so the whole rule set is
    hash-checkable against a SQL twin. One narrow projection, zero
    shuffles; Catalyst expressions only."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    lines = F.split(t, r"\n")
    n_words = F.size(toks)
    word_chars = F.length(F.regexp_replace(F.trim(t), r"\s", ""))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).startswith("-")
            | F.ltrim(ln).startswith("*")
            | F.ltrim(ln).startswith("\u2022"),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.rtrim(ln).endswith("...") | F.rtrim(ln).endswith("\u2026"),
        )
    )
    n_symbols = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))) + (
        F.length(t) - F.length(F.replace(t, F.lit("\u2026"), F.lit("")))
    )
    low = F.lower(t)
    n_stop = sum(
        F.when(low.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
        for w in stopwords
    )
    base = docs.filter(F.length(F.trim(t)) > 0).select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_symbols.cast("int").alias("n_symbols"),
        n_stop.cast("int").alias("n_stop_hits"),
    )
    w, wc = F.col("n_words"), F.col("word_chars")
    passes = (
        w.between(50, 100_000)
        & (wc >= 3 * w)
        & (wc <= 10 * w)
        & (10 * F.col("n_symbols") <= w)
        & (10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines"))
        & (10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"))
        & (5 * F.col("n_alpha_words") >= 4 * w)
        & (F.col("n_stop_hits") >= 2)
    )
    return base.withColumn("passes", passes.cast("int"))


def c4_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The C4 line/page cleaning heuristics (Raffel et al., JMLR 2020
    §2.2 — the other canonical pre-training corpus gate, complementing
    :func:`gopher_rules`' document-statistics filter):

     * LINE filter: keep only lines that end in terminal punctuation
       (. ! ? "), contain >= 5 words, and don't mention "javascript"
     * PAGE filter: drop pages containing "lorem ipsum" or a curly
       brace '{' (boilerplate/code), or with < 3 sentences surviving
       the line filter

    Emits exact integer signals per document — n_lines, n_kept_lines,
    n_sentences (terminal-punct count over the kept text), kept_words,
    has_lorem, has_brace — and `passes`, all Catalyst expressions on a
    single narrow projection: zero shuffles, bit-identical across
    engines, hash-checkable against a SQL twin. (C4's corpus-level
    three-sentence-span dedup is the separate corpus operator —
    substring_duplicate_spans covers that family.)"""
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.rtrim(ln).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(ln), r"\s+")) >= 5)
        & ~F.lower(ln).contains("javascript"),
    )
    kept_text = F.array_join(kept, "\n")
    n_sentences = F.size(F.split(kept_text, r"[.!?]")) - 1
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    base = docs.filter(F.length(F.trim(t)) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.when(F.length(kept_text) > 0, n_sentences)
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_sentences"),
        F.when(
            F.length(F.trim(kept_text)) > 0,
            F.size(F.split(F.trim(kept_text), r"\s+")),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("kept_words"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
    )
    passes = (
        (F.col("has_lorem") == 0)
        & (F.col("has_brace") == 0)
        & (F.col("n_sentences") >= 3)
    )
    return base.withColumn("passes", passes.cast("int"))


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic text normalization — the standard first stage of a
    pre-training pipeline (C4/Gopher/RefinedWeb all normalize before
    filtering): strip control characters (tab/newline fold to spaces),
    drop zero-width code points, fold curly quotes and en/em dashes to
    ASCII, collapse runs of whitespace, trim. Pure Catalyst regexp
    chain — zero shuffles, engine-reproducible byte-for-byte (the
    regexes avoid Java-vs-RE2 dialect corners: explicit character
    classes and literal alternations only). Returns (doc_id, text_norm,
    orig_len, norm_len, changed)."""
    t = F.col(text_col)
    norm = F.regexp_replace(t, "[\u200b\u200c\u200d\ufeff]", "")
    norm = F.regexp_replace(norm, "[\u2018\u2019]", "'")
    norm = F.regexp_replace(norm, "[\u201c\u201d]", '"')
    norm = F.regexp_replace(norm, "[\u2013\u2014]", "-")
    # control chars -> space (words separated by tab/newline stay apart)
    norm = F.regexp_replace(norm, "[\u0000-\u001f\u007f]", " ")
    norm = F.trim(F.regexp_replace(norm, "[ ]+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        norm.alias("text_norm"),
        F.length(t).cast("int").alias("orig_len"),
        F.length(norm).cast("int").alias("norm_len"),
        (norm != t).cast("int").alias("changed"),
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """Bigram perplexity-proxy (the next rung above
    :func:`unigram_logprob` on the KenLM-filter ladder): the mean
    add-k-smoothed bigram log-probability of each document under the
    corpus's own bigram distribution,

        ln P(b|a) = ln( (c(a,b) + k) / (c(a·) + k·V) )

    with c(a·) the count of bigrams starting with ``a`` and V the
    unigram vocabulary size. Formulaic/templated text scores high;
    garbled or shuffled text scores very negative even when its
    unigrams are common — the signal unigram scoring can't see.

    One pass extracts bigrams per document (array transform + explode —
    no self-join), then the stream is PRE-AGGREGATED to (doc_id, w1, w2,
    n) before anything joins (r7, the r6 verdict's top perf ask): the
    count tables roll up from the deduped frame, the score joins carry
    one row per distinct per-doc bigram instead of one per occurrence —
    shrinking the zipfian-headed w1 join by the per-doc repetition
    factor — and the doc aggregate becomes an n-weighted mean (exactly
    equal to the per-occurrence mean). All counts are exact integers;
    the score is a pure function of the corpus, so a SQL twin replays
    it. Returns (doc_id, n_bigrams, avg_logprob)."""
    arr = F.split(F.trim(F.col(text_col)), r"\s+")
    bg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                "CASE WHEN size(split(trim({t}), '\\\\s+')) < 2 THEN array() ELSE "
                "transform(sequence(1, size(split(trim({t}), '\\\\s+')) - 1), "
                "i -> struct(split(trim({t}), '\\\\s+')[i - 1] AS w1, "
                "            split(trim({t}), '\\\\s+')[i] AS w2)) END".format(t=text_col)
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    dg = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n"))
    cab = dg.groupBy("w1", "w2").agg(F.sum("n").alias("c_ab"))
    ca = dg.groupBy("w1").agg(F.sum("n").alias("c_a"))
    vocab = (
        docs.select(F.explode(arr).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("v"))
    )
    return (
        dg.join(cab, ["w1", "w2"])
        .join(ca, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            (
                F.sum(
                    F.col("n")
                    * F.log(
                        (F.col("c_ab") + F.lit(k))
                        / (F.col("c_a") + F.lit(k) * F.col("v"))
                    )
                )
                / F.sum("n")
            ).alias("avg_logprob"),
        )
    )

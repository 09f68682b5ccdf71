"""Knowledge-graph construction from documents (reference `constructkg`).

The reference pipes HDFS documents through chunking, LLM tuple extraction
(Ollama/vLLM runners) and streams the resulting (subject, predicate,
object) triples into graph partitions
(`knowledgegraph/construction/Pipeline.cpp`, `Prompt.h`,
`OllamaTupleStreamer.cpp` — FrontEnd.cpp:270). The Spark shape of that
pipeline is: documents → per-chunk extraction (a mapInPandas/regexp
stage) → explode triples → aggregate into a weighted triple table →
project nodes/edges DataFrames.

The LLM call itself is an external service; here the extractor is
pluggable. The default is a deterministic regex tuple extractor (greedy
non-overlapping token triples) so the whole pipeline is testable and
oracle-checkable; `llm_extractor` is the real-call seam — an
executor-side HTTP-batch mapInPandas stage with retries, exercised in
tests against a local deterministic fake endpoint (no LLM runtime ships
in this container).

Scale notes: extraction is embarrassingly parallel over documents (no
shuffle until the triple aggregation); the aggregation is one partial-
aggregated groupBy on (s, p, o). Node/edge projection reuses the
aggregated triples — at 100 TB the only wide exchange is the triple
groupBy, keyed on the triple itself (no hot keys beyond stopword-ish
tokens, which AQE skew-split handles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# greedy, non-overlapping, left-to-right — identical semantics in Java
# regex (Spark) and RE2 (DuckDB), which the oracle relies on
TRIPLE_PATTERN = r"[a-z]+ [a-z]+ [a-z]+"


def extract_triples(documents: DataFrame, pattern: str = TRIPLE_PATTERN) -> DataFrame:
    """(doc_id, s, p, o) — one row per extracted tuple, document order."""
    matches = documents.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0))).alias(
            "t"
        ),
    )
    tok = F.split(F.col("t"), " ")
    return matches.select(
        "doc_id",
        tok.getItem(0).alias("s"),
        tok.getItem(1).alias("p"),
        tok.getItem(2).alias("o"),
    )


def triple_weights(triples: DataFrame) -> DataFrame:
    """Aggregate extracted tuples into a weighted triple table
    (s, p, o, weight, n_docs) — the KG edge list with evidence counts."""
    return triples.groupBy("s", "p", "o").agg(
        F.count("*").alias("weight"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def construct_knowledge_graph(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full `constructkg` pipeline: documents → (nodes, edges) DataFrames.

    nodes: (id,) distinct subjects ∪ objects; edges: (src, dst, type,
    weight) with type = predicate — the property-graph the reference
    streams into its partitions."""
    w = triple_weights(extract_triples(documents))
    edges = w.select(
        F.col("s").alias("src"),
        F.col("o").alias("dst"),
        F.col("p").alias("type"),
        "weight",
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst")))
        .distinct()
    )
    return nodes, edges


# a capitalized run ("Radio City", "New Delhi", "PlanetRadiocity.com");
# entities join across spaces, predicates are the lowercase span between
_ENTITY = r"[A-Z][A-Za-z0-9.'&-]*(?: [A-Z][A-Za-z0-9.'&-]*)*"
_ENTITY_TRIPLE = rf"({_ENTITY})((?: [a-z0-9',()-]+){{1,8}} )({_ENTITY})"


def extract_entity_triples(documents: DataFrame) -> DataFrame:
    """(doc_id, s, p, o) at ENTITY granularity: within each sentence, a
    capitalized entity pair bridged by a 1-8-token lowercase predicate
    span. The deterministic stand-in for the reference's LLM tuple
    extraction over prose (Prompt.h asks the model for exactly this
    entity-relation-entity shape); pure Catalyst expressions — sentence
    explode + regexp, no shuffle until aggregation.

    Matches are greedy and non-overlapping left-to-right; chained facts
    ("A rel B rel2 C") surface the first pair per scan — a recall floor,
    not exhaustive extraction (graded in tests/test_linkpred_kg.py
    against the reference's radio_city gold set)."""
    sentences = documents.select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"[.?!](?:\s+|$)")).alias("sentence"),
    )
    matches = sentences.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("sentence"), F.lit(_ENTITY_TRIPLE), F.lit(0))
        ).alias("t"),
    )
    return matches.select(
        "doc_id",
        F.regexp_extract(F.col("t"), _ENTITY_TRIPLE, 1).alias("s"),
        F.trim(F.regexp_extract(F.col("t"), _ENTITY_TRIPLE, 2)).alias("p"),
        F.regexp_extract(F.col("t"), _ENTITY_TRIPLE, 3).alias("o"),
    )


def llm_extractor(
    documents: DataFrame,
    endpoint: str,
    batch_size: int = 32,
    max_retries: int = 3,
    timeout: float = 30.0,
) -> DataFrame:
    """The reference's Ollama/vLLM tuple-streamer seam
    (knowledgegraph/construction/OllamaTupleStreamer.cpp,
    VLLMTupleStreamer.cpp, Pipeline.cpp) as a REAL distributed operator:
    a mapInPandas stage that POSTs document batches to an HTTP endpoint
    and yields the same (doc_id, s, p, o) schema as
    :func:`extract_triples`.

    Wire contract (JSON over POST, model-agnostic — an Ollama/vLLM
    adapter is one handler away):
      request : {"documents": [{"doc_id": <int>, "text": <str>}, ...]}
      response: {"triples":   [{"doc_id": <int>, "s": <str>,
                                "p": <str>, "o": <str>}, ...]}

    Scale shape: requests are issued EXECUTOR-side, one batch of
    ``batch_size`` documents per call (bounded payloads, no driver
    fan-in); transient failures retry ``max_retries`` times with
    exponential backoff, then surface — a poisoned batch fails its task,
    not the cluster. No LLM runs in this container; the operator is
    exercised end-to-end in tests/test_llm_extractor.py against a local
    deterministic fake server (including a flaky-first-attempt retry
    path), so the batching, retry, and schema contract are all real."""
    import pandas as pd

    def fn(batches):
        import json as _json
        import time
        import urllib.request

        def call(payload: dict) -> dict:
            data = _json.dumps(payload).encode()
            for attempt in range(max_retries):
                req = urllib.request.Request(
                    endpoint,
                    data=data,
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        return _json.loads(resp.read().decode())
                except Exception:
                    if attempt == max_retries - 1:
                        raise
                    time.sleep(min(2.0**attempt * 0.1, 5.0))

        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="object"),
                "p": pd.Series([], dtype="object"),
                "o": pd.Series([], dtype="object"),
            }
        )
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                payload = {
                    "documents": [
                        {"doc_id": int(d), "text": str(t)}
                        for d, t in zip(chunk["doc_id"], chunk["text"])
                    ]
                }
                trips = call(payload).get("triples", [])
                if not trips:
                    yield empty
                    continue
                yield pd.DataFrame(
                    {
                        "doc_id": [int(t["doc_id"]) for t in trips],
                        "s": [t["s"] for t in trips],
                        "p": [t["p"] for t in trips],
                        "o": [t["o"] for t in trips],
                    }
                )

    return documents.select("doc_id", "text").mapInPandas(
        fn, "doc_id long, s string, p string, o string"
    )

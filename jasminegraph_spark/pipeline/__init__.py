from jasminegraph_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    char_shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    jaccard_verified_dedup,
    dedup_corpus,
    line_dedup,
    simhash_signatures,
    simhash_near_dup,
    substring_duplicate_spans,
)
from jasminegraph_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    knn_classify,
    mine_triplets,
    rrf_fuse,
    pca_project,
    pca_invariants,
    embedding_hygiene,
    sign_lsh_buckets,
    banded_sign_buckets,
    embedding_near_dup,
    semantic_dedup,
    sign_lsh_ann,
    ivf_assign,
    ivf_ann,
    kmeans_centroids,
    sq_minmax,
    sq_encode,
    sq_ann,
)
from jasminegraph_spark.pipeline.kg import (  # noqa: F401
    construct_knowledge_graph,
    extract_entity_triples,
    extract_triples,
    triple_weights,
)
from jasminegraph_spark.pipeline.sampling import (  # noqa: F401
    hash_split,
    stratified_sample,
    kmv_distinct,
    kmv_sketch_by,
    kmv_merge_sketches,
    weighted_sample,
    temperature_mixture,
    sampled_quantiles,
    skew_report,
)
from jasminegraph_spark.pipeline.text import (  # noqa: F401
    token_counts,
    unigram_logprob,
    bm25_topk,
    vocab_coverage,
    language_id,
    quality_scores,
    doc_fingerprint,
    embed_text,
    repetition_scores,
    gopher_rules,
)
from jasminegraph_spark.pipeline.packing import (  # noqa: F401
    chunk_documents,
    pack_sequences,
    packing_stats,
    quality_filter_chain,
)
from jasminegraph_spark.pipeline.scrub import (  # noqa: F401
    pii_redact,
    token_ngrams,
    decontaminate,
    tfidf_top_terms,
)

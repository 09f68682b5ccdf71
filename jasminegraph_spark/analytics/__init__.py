from jasminegraph_spark.analytics.graph_algs import (  # noqa: F401
    canonical_undirected,
    triangle_count,
    triangle_count_df,
    triangle_list,
    pagerank,
    personalized_pagerank,
    top_k_pagerank,
    degree_distribution,
    egonet,
    clustering_coefficient,
    degree_assortativity,
    edge_support,
    k_truss,
    random_walks,
    hits,
    square_count,
    walk_cooccurrence_pmi,
)
from jasminegraph_spark.analytics.beam_search import semantic_beam_search  # noqa: F401
from jasminegraph_spark.analytics.linkpred import (  # noqa: F401
    link_prediction,
    link_prediction_embedding,
    node_embeddings,
    sage_embeddings,
)
from jasminegraph_spark.analytics.linkpred_ml import (  # noqa: F401
    auc,
    federated_train_merge,
    link_example_features,
    link_prediction_trained,
    train_link_predictor,
)
from jasminegraph_spark.analytics.components import (  # noqa: F401
    betweenness_sampled,
    connected_components,
    connected_components_alternating,
    k_core,
    label_propagation,
    shortest_paths,
    multi_source_bfs,
    closeness_centrality,
    harmonic_centrality,
    weighted_shortest_paths,
    modularity,
    feature_smoothing,
    core_numbers,
    coarsen,
)

"""Connected components + k-core on graphs with known structure."""

from jasminegraph_spark.analytics import connected_components, k_core


def test_connected_components(spark):
    # two components: triangle {1,2,3} and path 10-11-12-13
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_k_core(spark):
    # K4 on {1,2,3,4} plus a pendant chain 4-5-6: 3-core = the K4 only
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    core3 = k_core(df, 3)
    assert sorted((r["a"], r["b"]) for r in core3.collect()) == sorted(k4)
    # 4-core is empty; 1-core keeps everything
    assert k_core(df, 4).count() == 0
    assert k_core(df, 1).count() == len(edges)


def test_shortest_paths_bfs(spark):
    # path 1-2-3-4-5 plus shortcut 1-4: distances from 1
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    from jasminegraph_spark.analytics import shortest_paths

    got = {r["node"]: r["distance"] for r in shortest_paths(df, 1).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # unreachable nodes are absent; directed variant respects orientation
    got_dir = {
        r["node"]: r["distance"]
        for r in shortest_paths(
            spark.createDataFrame([(1, 2), (3, 1)], ["src", "dst"]), 1, undirected=False
        ).collect()
    }
    assert got_dir == {1: 0, 2: 1}

"""Semantic beam search + multimodal Pandas-UDF plumbing."""

import pytest
from pyspark.sql import functions as F

from jasminegraph_spark.analytics.beam_search import semantic_beam_search
from jasminegraph_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    encode_fake_payload,
    frame_sample,
    resize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", encode_fake_payload("image", 8, 6, seed=1), {"src": "cam1"}),
        (2, "image", encode_fake_payload("image", 16, 16, seed=2), {"src": "cam2"}),
        (3, "video", encode_fake_payload("video", 4, 12, seed=3), {"fps": "30"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media(media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert out[1]["width"] == 8 and out[1]["height"] == 6 and out[1]["n_bytes"] == 48
    assert len(out[2]["byte_hist"]) == 16
    assert abs(sum(out[2]["byte_hist"]) - 1.0) < 1e-6


def test_resize_then_decode_composes(media):
    resized = resize_media(media, 4, 4)
    out = {r["media_id"]: r for r in decode_media(resized).collect()}
    assert all(r["width"] == 4 and r["height"] == 4 for r in out.values())
    assert out[3]["n_bytes"] == 16


def test_frame_sample(media):
    frames = frame_sample(media.filter(F.col("kind") == "video"), every_n=4).collect()
    assert [f["frame_no"] for f in frames] == [0, 4, 8]
    assert all(len(f["frame"]) == 4 for f in frames)


def test_decode_rejects_unknown_container(spark):
    bad = spark.createDataFrame([(9, "image", b"NOPE1234", {})], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="JGMM|unknown media|real codec"):
        decode_media(bad).collect()


def test_beam_search_on_grid(spark):
    # path graph 0-1-2-...-9; embeddings = 2D points on a line so that
    # cosine to the query [1, 0.1] ranks nodes deterministically
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], ["src", "dst"])
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    beam = semantic_beam_search(
        edges, emb, query_vec=[1.0, 0.1], beam_width=2, hops=3, undirected=True
    )
    rows = beam.collect()
    # seeds: node 0 ([1,0]) most aligned with [1,0.1]; runner-up node 1
    seeds = sorted(r["node"] for r in rows if r["hop"] == 0)
    assert seeds == [0, 1]
    # every hop-h node's path has h+1 entries and walks real edges
    for r in rows:
        assert len(r["path"]) == r["hop"] + 1
        for a, b in zip(r["path"], r["path"][1:]):
            assert abs(a - b) == 1
    # frontier never revisits: all nodes distinct across the beam
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))

"""Every queries() entry with an oracle must match it exactly — the local
mirror of the driver's t2 correctness gate."""

import pytest

import __spark_entry__ as entry_mod
from tests.parity import compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# r14 (VERDICT r13 #2): the handful of parity rows that each take tens of
# seconds at sf0.001 (iterative many-job algorithms and multi-batch
# streaming trackers — measured with --durations over two full runs) live
# in the `sweep` tier so the default suite fits the driver's verify
# window. They stay fully runnable (pytest -m sweep, or
# scripts/check_sf.py for the driver-identical compare at any SF), and
# the round driver independently verifies a rotating 50-query oracle
# window every round.
_SLOW_SWEEP = {
    "st_incremental_wcc",
    "st_incremental_triangles",
    "st_restart_replay",
    "st_stream_stream_join",
    "st_streaming_dedup",
    "st_session_window_counts",
    "an_scc",
    "an_msf",
    "an_coloring",
    "an_betweenness_sampled",
    "an_clustering_coefficient",
    "an_wcc_alternating",
    "an_link_prediction_federated",
    "cy_write_roundtrip",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.sweep) if n in _SLOW_SWEEP else n
        for n in sorted(_QUERIES)
    ],
)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in _ORACLES:
        assert spark_pdf is not None  # rows-only check, mirrors driver
        return
    oracle_pdf = duck.sql(_ORACLES[name]).df()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)

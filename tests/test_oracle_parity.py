"""Every queries() entry with an oracle must match it exactly — the local
mirror of the driver's t2 correctness gate."""

import pytest

import __spark_entry__ as entry_mod
from tests.parity import compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
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

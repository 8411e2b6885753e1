"""The correctness gate, locally: every registered query with an
oracle must hash-match DuckDB at sf0.01 — exactly what the driver
records into CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from tda596_lab02mapreduce_spark.registry import registry
from tests.oracle import compare

_QUERIES = registry()
_WITH_ORACLE = [q for q in _QUERIES.values() if q.oracle is not None]


@pytest.mark.parametrize("query", _WITH_ORACLE, ids=[q.name for q in _WITH_ORACLE])
def test_query_matches_oracle(spark, sf_correctness, query):
    compare(spark, sf_correctness, query.spark_fn, query.oracle_text())


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs), "every oracle key must have a query"

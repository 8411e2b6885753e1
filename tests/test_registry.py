"""Registry-wide output-shape contract.

The driver harness canonicalizes every query's result through a pandas
sort/hash; pandas cannot factorize list/dict cells, so any registered
query that returns a top-level ArrayType/MapType/StructType column gets
an ERR row no matter how correct its values are (round-2's
``embedding_quantize_int8`` red row). This test makes that a local
failure: every registered query's schema must be scalar at the top
level — flatten with posexplode / concat_ws / to_json before returning.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from tda596_lab02mapreduce_spark.registry import registry

_QUERIES = list(registry().values())


@pytest.mark.parametrize("query", _QUERIES, ids=[q.name for q in _QUERIES])
def test_no_nested_top_level_columns(spark, sf_smoke, query):
    df = query.spark_fn(spark, sf_smoke)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{query.name} returns nested top-level column(s) {bad}: the driver "
        "canonicalizer cannot hash them — flatten (posexplode / concat_ws / "
        "to_json) before returning"
    )


def test_readme_inventory_counts_match_registry():
    """The README's headline inventory counts are part of the evidence
    ledger — they must equal the live registry (the review caught them
    10 queries stale; this pins them forever)."""
    import os
    import re

    from tda596_lab02mapreduce_spark.registry import registry

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(
        r"## Query inventory \((\d+) named queries, (\d+) DuckDB-oracle-checked\)",
        readme,
    )
    assert m, "README inventory header missing"
    r = registry()
    assert int(m.group(1)) == len(r), (m.group(1), len(r))
    assert int(m.group(2)) == sum(1 for q in r.values() if q.oracle is not None)


def test_bench_isolated_subset_of_headline():
    """bench.py's process-isolated group must stay a subset of
    HEADLINE (a name drifting out of HEADLINE would silently vanish
    from the artifact instead of failing)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert set(bench.ISOLATED) <= set(bench.HEADLINE)
    # the 19-query round-1 anchor subset must be entirely main-session
    # (isolation must never move the gate metric)
    assert not set(bench.ISOLATED) & set(bench.HEADLINE[: bench.R1_ANCHOR_N])
    # the worker's outlier re-run rule needs a solo band for EVERY
    # isolated query (a missing entry silently disables the rule)
    assert set(bench.SOLO_BAND_SEC) == set(bench.ISOLATED)
    # the main-session watchlist must stay main-session and headline
    assert set(bench.MAIN_BAND_SEC).isdisjoint(bench.ISOLATED)
    assert set(bench.MAIN_BAND_SEC) <= set(bench.HEADLINE)

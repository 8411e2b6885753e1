"""Driver-session simulation (VERDICT r1 §What's wrong #1).

The correctness harness builds its *own* SparkSession with none of
session.py's configs — in round 1 that crashed every query touching
``events.parquet`` (TIMESTAMP(NANOS) → PARQUET_TYPE_ILLEGAL) because
only the builder's session pre-set
``spark.sql.legacy.parquet.nanosAsLong``. ``io.load`` now sets that
runtime SQL conf at read time, so a config-free session must work.

We can't boot a second JVM per test, so the simulation is: *unset* the
conf on the shared session (restoring the driver's default state),
prove the bare read still fails without io.load's help, then prove
io.load and each previously-red query succeed.
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from tda596_lab02mapreduce_spark import io, registry

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# The five CORRECTNESS_r01.json ERR rows — all one root cause.
RED_ROUND1 = [
    "join_asof_purchase_click",
    "scalar_json",
    "set_intersect",
    "set_except",
    "grouping_sets",
]


def _unset_nanos_conf(spark):
    try:
        spark.conf.unset(NANOS_CONF)
    except Exception:
        pass


def test_bare_events_read_fails_without_conf(spark, sf_smoke):
    """Sanity: the unset really restores the driver's failing state —
    otherwise the recovery assertions below prove nothing."""
    _unset_nanos_conf(spark)
    with pytest.raises(AnalysisException, match="PARQUET_TYPE_ILLEGAL"):
        spark.read.parquet(f"{sf_smoke}/events.parquet").collect()
    # leave the session usable for whatever test runs next
    spark.conf.set(NANOS_CONF, "true")


def test_io_load_events_on_config_free_session(spark, sf_smoke):
    _unset_nanos_conf(spark)
    df = io.load(spark, sf_smoke, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("name", RED_ROUND1)
def test_round1_red_queries_on_config_free_session(spark, sf_smoke, name):
    _unset_nanos_conf(spark)
    df = registry.get(name).spark_fn(spark, sf_smoke)
    assert df.count() >= 0  # materializes without PARQUET_TYPE_ILLEGAL

"""Upsert operator semantics (operators/upsert.py) on hand-built
frames where every MERGE branch — update, insert, passthrough — is
present, including the NULL-overwrite case a per-column coalesce
would get wrong."""

from __future__ import annotations

import pytest

from tda596_lab02mapreduce_spark.operators.upsert import upsert

COLS = ["k", "name", "score"]


def test_update_insert_passthrough_and_null_overwrite(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], COLS
    )
    updates = spark.createDataFrame(
        [(2, "b2", None), (4, "d", 40)],
        "k INT, name STRING, score INT",
    )
    got = {r["k"]: (r["name"], r["score"]) for r in upsert(base, updates, "k").collect()}
    assert got == {
        1: ("a", 10),      # passthrough
        2: ("b2", None),   # matched: update row wholesale, NULL included
        3: ("c", 30),      # passthrough
        4: ("d", 40),      # insert
    }


def test_schema_mismatch_rejected(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "name"])
    updates = spark.createDataFrame([(1, 2)], ["k", "other"])
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert(base, updates, "k")

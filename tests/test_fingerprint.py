"""Property tests for the reconciliation-fingerprint band (r9):
distributivity (the load-bearing claim — partial fingerprints merge
to the whole-table fingerprint) and sensitivity (any row change moves
at least one component)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import get


def _fingerprint_of(spark, df):
    """The same canonical-render + md5-32-halves + commutative combine
    the query uses, over an arbitrary orders-shaped frame."""
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        F.col("o_orderstatus"),
        F.unix_micros(F.to_utc_timestamp(F.col("o_orderdate"), "UTC")).cast("string"),
        F.col("o_orderpriority"),
        F.col("o_custkey").cast("string"),
    )
    md5 = F.md5(row_str)
    h = df.select(
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("bit_xor(h1)").cast("bigint").alias("xor_lo"),
        F.expr("bit_xor(h2)").cast("bigint").alias("xor_hi"),
        F.sum("h1").cast("decimal(38,0)").alias("sum_lo"),
    ).collect()[0]


def _merge(parts):
    n = sum(p["n_rows"] for p in parts)
    xl = xh = 0
    s = 0
    for p in parts:
        xl ^= p["xor_lo"]
        xh ^= p["xor_hi"]
        s += int(p["sum_lo"])
    return (n, xl, xh, s)


def test_fingerprint_is_distributive(spark, sf_smoke):
    """fingerprint(A ∪ B) == merge(fingerprint(A), fingerprint(B)) for
    a disjoint split — the property that makes both the one-pass
    partial aggregation and the streaming per-batch maintenance
    correct."""
    o = io.load(spark, sf_smoke, "orders")
    whole = _fingerprint_of(spark, o)
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)
    merged = _merge([_fingerprint_of(spark, a), _fingerprint_of(spark, b)])
    assert merged == (
        whole["n_rows"], whole["xor_lo"], whole["xor_hi"], int(whole["sum_lo"])
    )


def test_fingerprint_detects_single_value_change(spark, sf_smoke):
    """Perturbing ONE row's totalprice by one cent changes the
    fingerprint (XOR or sum component)."""
    o = io.load(spark, sf_smoke, "orders")
    base = _fingerprint_of(spark, o)
    perturbed = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    )
    pert = _fingerprint_of(spark, perturbed)
    assert (
        pert["xor_lo"] != base["xor_lo"]
        or pert["xor_hi"] != base["xor_hi"]
        or int(pert["sum_lo"]) != int(base["sum_lo"])
    )
    assert pert["n_rows"] == base["n_rows"]


def test_lpa_is_run_deterministic(spark, sf_smoke):
    """Two executions of community_label_propagation produce
    bit-identical assignments (the fixed-round integer-argmax
    contract — no run-to-run tie drift)."""
    q = get("community_label_propagation")
    a = sorted(tuple(r) for r in q.spark_fn(spark, sf_smoke).collect())
    b = sorted(tuple(r) for r in q.spark_fn(spark, sf_smoke).collect())
    assert a == b


def test_floor_balance_identity_matches_literal_recursion(spark, sf_smoke):
    """The reflected-walk identity b_t = S_t - min(0, min_{j<=t} S_j)
    used by inventory_floor_balance equals a literal Python
    re-execution of the recursion b_t = max(0, b_{t-1} + x_t) on every
    user of the smoke fixture."""
    from collections import defaultdict

    from tda596_lab02mapreduce_spark.registry import get

    out = get("inventory_floor_balance").spark_fn(spark, sf_smoke)
    rows = out.collect()
    got = {(r["user_id"], r["event_id"]): r["balance_c"] for r in rows}

    ev = io.load(spark, sf_smoke, "events").filter(
        F.col("event_type").isin("purchase", "error")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("bigint"),
        )
        .otherwise(-F.round(F.col("value") * 100, 0).cast("bigint"))
        .alias("delta_c"),
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    checked = 0
    for uid, urows in by_user.items():
        bal = 0
        for r in sorted(urows, key=lambda x: (x["ts"], x["event_id"])):
            bal = max(0, bal + r["delta_c"])
            assert got[(uid, r["event_id"])] == bal, (uid, r["event_id"])
            checked += 1
    assert checked == len(rows) and checked > 0

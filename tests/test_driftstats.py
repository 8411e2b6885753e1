"""Property + plan tests for the round-7 drift/power-law band
(queries/driftstats.py): each operator re-derived by a naive
driver-side reference, the 8-dp decimal-term rounding margins that
make the log-based oracles sound, and the plan shapes (single scan,
keyed windows only over tiny aggregates)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from tda596_lab02mapreduce_spark import io, plans
from tda596_lab02mapreduce_spark.registry import get

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _margin_ok(unrounded: float, dp: int, tol: float = 1e-6) -> bool:
    scaled = unrounded * 10**dp
    return abs(scaled - math.floor(scaled) - 0.5) > tol


def test_psi_matches_naive_and_margins(spark, sf_correctness):
    """Naive Python PSI over the raw events (same bins, same +1
    smoothing) must reproduce psi_total to 1e-6, every per-bin term
    must clear the 8-dp rounding boundary, and the bin partition must
    cover all events exactly once."""
    ev = [
        (r.value, r.ts)
        for r in io.load(spark, sf_correctness, "events").select("value", "ts").collect()
    ]
    from datetime import datetime

    boundary = datetime(2024, 1, 16)
    ref = Counter()
    cur = Counter()
    for value, ts in ev:
        b = min(int(value // 50.0), 9)
        (ref if ts < boundary else cur)[b] += 1
    bins = sorted(set(ref) | set(cur))
    n_bins = len(bins)
    ref_tot, cur_tot = sum(ref.values()), sum(cur.values())
    psi = 0.0
    for b in bins:
        p = (ref[b] + 1) / (ref_tot + n_bins)
        q = (cur[b] + 1) / (cur_tot + n_bins)
        term = (p - q) * math.log(p / q)
        assert _margin_ok(term, 8), f"bin {b} term {term} at 8-dp boundary"
        psi += round(term, 8)
    rows = get("psi_value_drift").spark_fn(spark, sf_correctness).collect()
    assert {r.bin for r in rows} == set(bins)
    assert sum(r.ref_cnt for r in rows) + sum(r.cur_cnt for r in rows) == len(ev)
    for r in rows:
        assert r.psi_total == round(psi, 6)


def test_markov_rows_are_stochastic_and_complete(spark, sf_correctness):
    """Per-prev probabilities must sum to ~1, transition counts must
    total (events - users-with-events), and a naive per-user sorted
    replay must reproduce every (prev, next) count."""
    ev = (
        io.load(spark, sf_correctness, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    naive = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            naive[(a, b)] += 1
    rows = get("markov_event_transitions").spark_fn(spark, sf_correctness).collect()
    assert {(r.prev_type, r.next_type): r.n_trans for r in rows} == dict(naive)
    assert sum(r.n_trans for r in rows) == len(ev) - len(by_user)
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r.prev_type] += r.p_trans
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_pareto_curve_is_monotone_and_exhaustive(spark, sf_correctness):
    """Deciles partition all customers, shares sum to 1, the
    cumulative share is strictly increasing and ends at 1, and the
    decile revenue ordering is non-increasing (revenue-desc ntile)."""
    n_cust = (
        io.load(spark, sf_correctness, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    rows = sorted(
        get("pareto_revenue_concentration").spark_fn(spark, sf_correctness).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_customers for r in rows) == n_cust
    assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    for a, b in zip(rows, rows[1:]):
        assert b.cum_share > a.cum_share
    per_cust = [r.decile_rev / r.n_customers for r in rows]
    for a, b in zip(per_cust, per_cust[1:]):
        assert b <= a * (1 + 1e-9), "avg revenue per customer must fall by decile"


def test_zipf_fit_matches_naive_ols(spark, sf_correctness):
    """Closed-form OLS over (ln rank, ln freq) recomputed in Python
    from a naive token count must reproduce slope and intercept to
    1e-3 (the decimal-sum formulation differs only in 8-dp term
    rounding), and every ln term must clear its rounding boundary."""
    docs = io.load(spark, sf_correctness, "documents").select("text").collect()
    freq = Counter(w for r in docs for w in _WORD_RE.findall(r.text))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs, ys = [], []
    for i, (_, cnt) in enumerate(ranked, start=1):
        x, y = math.log(i), math.log(cnt)
        assert _margin_ok(x, 8) and _margin_ok(y, 8)
        xs.append(round(x, 8))
        ys.append(round(y, 8))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    [row] = get("zipf_token_fit").spark_fn(spark, sf_correctness).collect()
    assert row.vocab_size == n
    assert abs(row.zipf_slope - slope) < 1e-3
    assert abs(row.zipf_intercept - intercept) < 1e-3
    assert row.zipf_slope < 0, "rank-frequency slope must be negative"


def test_entropy_matches_naive_and_bounds(spark, sf_correctness):
    """Per-source entropy recomputed naively must match to 1e-5 and
    respect 0 <= H <= ln(n_unique); token totals must equal the
    naive tokenization."""
    docs = (
        io.load(spark, sf_correctness, "documents").select("source", "text").collect()
    )
    by_src = defaultdict(Counter)
    for r in docs:
        by_src[r.source].update(_WORD_RE.findall(r.text))
    rows = get("token_entropy_by_source").spark_fn(spark, sf_correctness).collect()
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        cnts = by_src[r.source]
        total = sum(cnts.values())
        assert r.n_tokens == total and r.n_unique == len(cnts)
        h = 0.0
        for c in cnts.values():
            p = c / total
            term = -p * math.log(p)
            assert _margin_ok(term, 8)
            h += round(term, 8)
        assert abs(r.entropy - h) < 1e-5
        assert -1e-9 <= r.entropy <= math.log(len(cnts)) + 1e-9


def test_drift_band_plan_shapes(spark, sf_correctness):
    """Each operator never produces a cartesian, keeps a bounded
    Exchange count, and — since round 8 — has ZERO partition-less
    WindowExec nodes: the rank/cumsum queries route through
    functions.rank.global_rank_cumsum (range-partitioned local ranks
    + broadcast offsets; the localCheckpoint that pins the range
    boundaries replaces the parquet scan with an ExistingRDD scan in
    the final plan, so scan counts are asserted only for the
    checkpoint-free queries)."""
    for name, max_exchanges, expect_scan in [
        ("psi_value_drift", 3, True),
        ("markov_event_transitions", 3, True),
        ("pareto_revenue_concentration", 8, False),
        ("zipf_token_fit", 5, False),
        ("token_entropy_by_source", 2, True),
        ("ks_value_drift", 6, False),
        ("psi_value_drift_qbins", 8, False),
        ("gini_revenue_concentration", 5, False),
        ("mutual_information_type_hour", 6, True),
    ]:
        df = get(name).spark_fn(spark, sf_correctness)
        plan = plans.final_plan(df)
        if expect_scan:
            n_scans = plan.count("Scan parquet")
            assert n_scans == 1, f"{name}: {n_scans} scans\n{plan[:2000]}"
        assert not plans.has_operator(df, "CartesianProduct"), name
        n_ex = plans.count_nodes(plan, "Exchange")
        assert n_ex <= max_exchanges, f"{name}: {n_ex} exchanges\n{plan[:2000]}"
        n_pw = plans.partitionless_window_count(
            get(name).spark_fn(spark, sf_correctness)
        )
        assert n_pw == 0, f"{name}: {n_pw} partition-less windows"


def test_mutual_information_matches_naive(spark, sf_correctness):
    """MI recomputed naively from the joint contingency must match to
    1e-5; MI must be non-negative and bounded by min(H(X), H(Y));
    every term must clear the 8-dp rounding boundary."""
    ev = [
        (r.event_type, r.ts.hour)
        for r in io.load(spark, sf_correctness, "events")
        .select("event_type", "ts")
        .collect()
    ]
    joint = Counter(ev)
    n = len(ev)
    nx = Counter(t for t, _ in ev)
    ny = Counter(h for _, h in ev)
    mi = 0.0
    for (t, h), c in joint.items():
        term = (c / n) * math.log(c * n / (nx[t] * ny[h]))
        assert _margin_ok(term, 8)
        mi += round(term, 8)
    hx = -sum((c / n) * math.log(c / n) for c in nx.values())
    hy = -sum((c / n) * math.log(c / n) for c in ny.values())
    rows = get("mutual_information_type_hour").spark_fn(spark, sf_correctness).collect()
    assert len(rows) == len(joint)
    for r in rows:
        assert r.mi_total == round(mi, 6)
    assert -1e-9 <= round(mi, 6) <= min(hx, hy) + 1e-9


def test_gini_matches_naive_and_range(spark, sf_correctness):
    """Gini recomputed by the rank formula over exact per-customer
    revenue must match to 1e-9, and must land in [0, 1)."""
    from decimal import Decimal

    rev = defaultdict(Decimal)
    for r in (
        io.load(spark, sf_correctness, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        rev[r.o_custkey] += Decimal(str(round(r.o_totalprice, 2)))
    xs = [v for _, v in sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(xs)
    s = sum(xs)
    si = sum(Decimal(i) * x for i, x in enumerate(xs, start=1))
    gini = (2.0 * float(si) - (n + 1) * float(s)) / (n * float(s))
    [row] = get("gini_revenue_concentration").spark_fn(spark, sf_correctness).collect()
    assert row.n_customers == n
    assert abs(row.gini - round(gini, 6)) < 1e-9
    assert 0.0 <= row.gini < 1.0


def test_acf_matches_naive(spark, sf_correctness):
    """ACF recomputed naively from the daily series (same 6-dp term
    rounding) must match every lag exactly; lag-k pair count must be
    n_days - k for the gap-free fixture month; |acf| <= 1."""
    from datetime import datetime

    days = Counter(
        r.ts.date()
        for r in io.load(spark, sf_correctness, "events").select("ts").collect()
    )
    series = sorted(days.items())
    xs = [c for _, c in series]
    n = len(xs)
    m = sum(xs) / n
    den = sum(round((x - m) * (x - m), 6) for x in xs)
    rows = {r.lag: r for r in get("acf_daily_events").spark_fn(spark, sf_correctness).collect()}
    assert set(rows) == set(range(1, 8))
    for k in range(1, 8):
        num = sum(round((xs[t] - m) * (xs[t + k] - m), 6) for t in range(n - k))
        assert rows[k].n_pairs == n - k
        assert rows[k].acf == round(num / den, 6), k
        assert abs(rows[k].acf) <= 1.0 + 1e-9


def test_ks_matches_naive(spark, sf_correctness):
    """KS D recomputed from the two raw samples must match to 1e-9;
    D must be in [0, 1]; the two half counts must partition the
    events."""
    from datetime import datetime

    boundary = datetime(2024, 1, 16)
    ref, cur = [], []
    for r in io.load(spark, sf_correctness, "events").select("value", "ts").collect():
        (ref if r.ts < boundary else cur).append(r.value)
    values = sorted(set(ref) | set(cur))
    ref_s, cur_s = sorted(ref), sorted(cur)
    import bisect

    d = 0.0
    for v in values:
        f1 = bisect.bisect_right(ref_s, v) / len(ref)
        f2 = bisect.bisect_right(cur_s, v) / len(cur)
        d = max(d, abs(f1 - f2))
    [row] = get("ks_value_drift").spark_fn(spark, sf_correctness).collect()
    assert row.n_ref == len(ref) and row.n_cur == len(cur)
    assert abs(row.ks_d - round(d, 6)) < 1e-9
    assert 0.0 <= row.ks_d <= 1.0


def test_cusum_matches_naive(spark, sf_correctness):
    """CUSUM recomputed naively (same 6-dp deviation rounding) must
    match every prefix; exactly one changepoint flagged, at the
    earliest |S| peak; the final S must telescope to ~0 (sum of
    deviations from the mean)."""
    days = Counter(
        r.ts.date()
        for r in io.load(spark, sf_correctness, "events").select("ts").collect()
    )
    series = sorted(days.items())
    from decimal import ROUND_HALF_UP, Decimal

    def d6(v: float) -> Decimal:
        # SQL ROUND semantics (half-up on the shortest repr), kept as
        # an exact Decimal so the prefix accumulation mirrors Spark's
        # DECIMAL(24,6) sums with no float chain in between
        return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    xs = [c for _, c in series]
    m = sum(xs) / len(xs)
    acc, prefix = Decimal(0), []
    for x in xs:
        acc += d6(x - m)
        prefix.append(float(acc))
    rows = sorted(
        get("cusum_changepoint_daily").spark_fn(spark, sf_correctness).collect(),
        key=lambda r: r.day,
    )
    assert [round(r.s_cusum, 6) for r in rows] == prefix
    flagged = [r for r in rows if r.is_changepoint]
    assert len(flagged) == 1
    peak = max(abs(p) for p in prefix)
    first_idx = next(i for i, p in enumerate(prefix) if abs(p) == peak)
    assert flagged[0].day == rows[first_idx].day
    assert abs(prefix[-1]) < 1e-3


def test_ab_test_matches_naive(spark, sf_correctness):
    """z recomputed naively from the user-hour conversion table must
    match to 1e-9; the two cohort sizes must partition all active
    user-hours."""
    ev = (
        io.load(spark, sf_correctness, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    hours = defaultdict(int)
    for r in ev:
        key = (r.user_id, r.ts.replace(minute=0, second=0, microsecond=0))
        hours[key] = max(hours[key], 1 if r.event_type == "purchase" else 0)
    n = Counter()
    c = Counter()
    for (uid, _), conv in hours.items():
        n[uid % 2] += 1
        c[uid % 2] += conv
    p_a, p_b = c[0] / n[0], c[1] / n[1]
    pool = (c[0] + c[1]) / (n[0] + n[1])
    z = (p_a - p_b) / math.sqrt(pool * (1 - pool) * (1 / n[0] + 1 / n[1]))
    [row] = get("ab_test_conversion_z").spark_fn(spark, sf_correctness).collect()
    assert (row.n_a, row.c_a, row.n_b, row.c_b) == (n[0], c[0], n[1], c[1])
    assert row.n_a + row.n_b == len(hours)
    assert abs(row.z_stat - round(z, 6)) < 1e-9


def test_holt_matches_naive(spark, sf_correctness):
    """The recursive-CTE Holt smoother recomputed as a plain Python
    fold (same α=0.5 β=0.25, same 6-dp per-step rounding) must
    reproduce all 7 forecast points exactly."""
    days = Counter(
        r.ts.date()
        for r in io.load(spark, sf_correctness, "events").select("ts").collect()
    )
    from decimal import ROUND_HALF_UP, Decimal

    def r6(v: float) -> float:
        # SQL ROUND is half-UP on the double's shortest decimal repr;
        # Python round() is half-EVEN — the difference surfaced as a
        # 1e-6 drift mid-recursion on a .5-tie. Mirror SQL exactly.
        return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    xs = [float(c) for _, c in sorted(days.items())]
    # mirror the SQL exactly: the trend update reuses the UNROUNDED
    # level expression (the CTE repeats the expression, it does not
    # reference the rounded column)
    raw = xs[1] * 0.5 + (xs[0] + (xs[1] - xs[0])) * 0.5
    level = r6(raw)
    trend = r6((raw - xs[0]) * 0.25 + (xs[1] - xs[0]) * 0.75)
    for x in xs[2:]:
        raw = x * 0.5 + (level + trend) * 0.5
        trend = r6((raw - level) * 0.25 + trend * 0.75)
        level = r6(raw)
    rows = {r.h: r.forecast for r in get("holt_forecast_daily").spark_fn(spark, sf_correctness).collect()}
    assert set(rows) == set(range(1, 8))
    for h in range(1, 8):
        assert rows[h] == r6(level + h * trend), h


def test_round7_late_band_plan_hygiene(spark, sf_correctness):
    """Blanket plan hygiene for the late round-7 operators: no
    cartesian products (the broadcast scalar joins must stay
    BroadcastNestedLoop over 1-row sides, never CartesianProduct),
    no unexpected rangepartitioning outside the queries that
    legitimately rank (pareto/gini/zipf/reservoir), and bounded
    parquet scan counts."""
    cases = {
        # name: (max parquet scans, global-sort allowed)
        "mutual_information_type_hour": (1, False),
        "gini_revenue_concentration": (1, True),
        "ks_value_drift": (1, True),
        "cusum_changepoint_daily": (1, True),
        "ab_test_conversion_z": (1, False),
        "acf_daily_events": (0, True),  # localCheckpointed series — no parquet in final plan
        "holt_forecast_daily": (2, True),  # recursion seed + step share the view
        "twap_user_value": (1, False),
        "debounce_events_1h": (1, False),
        "rollup_share_of_parent": (4, False),
        "dedup_passage_exact": (1, False),
        "embedding_centroid_outliers": (2, False),
        "funnel_time_to_convert": (2, False),
        "sample_weighted_reservoir": (1, False),
        "stream_psi_monitor": (0, True),  # reads the drained memory sink
        "sink_versioned_time_travel": (4, False),
        "sink_codec_zstd_roundtrip": (2, False),
        "pandas_api_groupby": (1, False),
    }
    for name, (max_scans, sort_ok) in cases.items():
        df = get(name).spark_fn(spark, sf_correctness)
        plan = plans.final_plan(df)
        assert not plans.has_operator(df, "CartesianProduct"), name
        # count tree NODES (op followed by its id), not raw substring
        # hits — non-adaptive plans repeat each node in the detail
        # section below the tree
        n_scans = plans.count_nodes(plan, "Scan parquet")
        assert n_scans <= max_scans, f"{name}: {n_scans} scans\n{plan[:1500]}"
        if not sort_ok:
            assert "rangepartitioning" not in plan.lower(), (
                f"{name} global-sorts\n{plan[:1500]}"
            )


def test_fixture_days_are_contiguous(spark, sf_correctness):
    """The events month has every calendar day present — the explicit
    precondition behind every rows-frame-over-days operator (sliding
    7-day distinct, ACF's n-k pair counts, the CUSUM/Holt day
    series). A fixture regeneration that introduces a day gap must
    fail HERE with a clear message, not as a subtle frame
    misalignment downstream."""
    days = sorted(
        {r.ts.date() for r in io.load(spark, sf_correctness, "events").select("ts").collect()}
    )
    span = (days[-1] - days[0]).days + 1
    assert span == len(days), f"day gap: {span} calendar days, {len(days)} present"


def test_mase_positive_and_consistent(spark, sf_correctness):
    from tda596_lab02mapreduce_spark.registry import get

    rows = get("forecast_mase_daily").spark_fn(spark, sf_correctness).collect()
    assert len(rows) == 5
    for r in rows:
        # 30 fixture days: 23 lag-7 points, 29 lag-1 points
        assert r["n_snaive"] == r["n_naive"] - 6
        assert r["mase_milli"] == (1000 * r["sae_snaive"] * r["n_naive"]) // (
            r["sae_naive"] * r["n_snaive"]
        )
        assert r["mase_milli"] > 0

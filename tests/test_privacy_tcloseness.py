"""t-closeness semantics (statml.py:privacy_t_closeness).

The hash gate proves cross-engine equality; these pin the EMD algebra
against an independent Python replay (true earth-mover over the
ordered bands, computed as work-moved, NOT the CDF-gap shortcut the
query uses — agreeing values prove the reduction), plus threshold
non-vacuity and the EMD range contract."""

from __future__ import annotations

import math
from collections import defaultdict

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.queries.statml import (
    _TCLOSE_T,
    privacy_t_closeness,
)


def test_tcloseness_matches_true_emd(spark, sf_correctness):
    cust = io.load(spark, sf_correctness, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    gl = defaultdict(int)
    ch = defaultdict(lambda: defaultdict(int))
    for r in cust:
        band = math.floor(r["c_acctbal"] / 2000)
        gl[band] += 1
        ch[(r["c_nationkey"], r["c_mktsegment"])][band] += 1
    bands = sorted(gl)
    n_tot, m = sum(gl.values()), len(bands)

    rows = privacy_t_closeness(spark, sf_correctness).collect()
    assert len(rows) == len(ch)
    fired = 0
    for r in rows:
        key = (r["nationkey"], r["segment"])
        n = sum(ch[key].values())
        assert n == r["n_coh"]
        # TRUE 1-D EMD: sequentially move probability mass between
        # adjacent bands; total moved = sum over prefix gaps.
        carry = 0.0
        moved = 0.0
        for bd in bands:
            carry += ch[key].get(bd, 0) / n - gl[bd] / n_tot
            moved += abs(carry)
        true_emd = moved / (m - 1)
        assert abs(r["emd"] - true_emd) < 1e-9  # the CDF-gap reduction
        assert 0.0 <= r["emd"] <= 1.0
        fired += bool(r["violates_t"])
        assert r["violates_t"] == (r["emd"] > _TCLOSE_T)
    assert fired > 0, "threshold vacuous at the correctness SF"
    assert fired < len(rows), "threshold fires everywhere — not an audit"

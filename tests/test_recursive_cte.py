"""Native recursive-CTE semantics (advanced.py:recursive_cte_bom_depth).

The hash gate proves both engines' recursions agree; these pin the
closed form a recursion bug would break: in the DIV-10 tree, a part's
depth IS its digit count minus one and its root IS its leading digit."""

from __future__ import annotations

from tda596_lab02mapreduce_spark.queries.advanced import recursive_cte_bom_depth


def test_depth_is_digit_count_and_root_is_leading_digit(spark, sf_smoke):
    rows = recursive_cte_bom_depth(spark, sf_smoke).collect()
    assert rows
    depths = set()
    for r in rows:
        s = str(r["part_id"])
        assert int(r["depth"]) == len(s) - 1
        assert int(r["root_id"]) == int(s[0])
        depths.add(int(r["depth"]))
    assert len(depths) >= 2  # a real multi-level recursion, not one pass

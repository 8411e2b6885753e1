"""Keyed upsert (MERGE) as a pure DataFrame composition.

Vanilla Spark has no MERGE INTO sink (that's a table-format feature —
Delta/Iceberg); the relational core of it — "update row if the key
exists, insert otherwise, keep untouched rows" — is a full-outer join
on the key with update-wins column coalescing. The reference's only
mutation primitive is whole-file atomic replace (mr/coordinator.go:
37-53); this is the record-level analogue a warehouse pipeline needs.

Scale shape: one shuffle of each side on the key (or none for the
big side if it's bucketed on the key; broadcast if the delta is
small — both picked by Catalyst/AQE, not hand-scheduled). Payloads
move at most once; no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["upsert"]


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Return ``base`` with rows from ``updates`` applied: matching
    keys take the update row wholesale (update-wins, SCD type 1),
    unmatched update keys are inserted, all other base rows pass
    through. Both inputs must share a schema containing ``key``."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base={sorted(base.columns)} "
            f"updates={sorted(updates.columns)}"
        )
    b, u = base.alias("b"), updates.alias("u")
    joined = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    # Row-wholesale update-wins: matched keys take EVERY update column,
    # including legitimate NULLs — a per-column coalesce would leak
    # stale base values under update NULLs.
    matched = F.col(f"u.{key}").isNotNull()
    return joined.select(
        *[
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
            if c != key
            else F.coalesce(F.col(f"u.{key}"), F.col(f"b.{key}")).alias(key)
            for c in base.columns
        ]
    )

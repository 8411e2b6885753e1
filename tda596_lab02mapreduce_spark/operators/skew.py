"""Skew mitigation for shuffle joins (SURVEY.md §2B scale notes).

First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it
handles skew discovered at runtime with zero user code. Salting is
the explicit fallback for the pathological case AQE can't fix: a
single join key so hot that one task would still receive it whole
(AQE splits a skewed *partition*, but a build-side row with a hot key
must still meet every probe row of that key).

``salted_join`` trades a bounded replication of the smaller side
(×salt_buckets) for an even spread of the hot key's probe rows across
salt_buckets tasks. Result is row-identical to the plain join
(property-tested in tests/test_skew.py).

The reference cannot express this at all: its partitioner is a fixed
``ihash(key) % nReduce`` (mr/worker.go:29-33,82), so one hot key
always lands whole on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on column ``on`` with the probe side
    salted into ``salt_buckets`` sub-keys and the build side replicated
    across all salts.

    - probe: the large/skewed side; each row's salt mixes the row hash
      with a per-row id, so even *byte-identical* duplicates of a hot
      key spread across buckets (hashing the row alone degrades to a
      plain join exactly when a hot key's rows are identical — the
      sentinel/default-row skew shape). The salt value never affects
      the result, only placement: the build side is replicated across
      all salts, so any salt assignment joins identically.
    - build: the smaller side (but assumed too big / unwanted to
      broadcast); replicated ×salt_buckets via one explode — a narrow
      map, no shuffle of its own beyond the join's.

    ``how`` supports inner/left (the probe-preserving joins where salt
    replication cannot invent or drop matches).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(
            F.struct(*[F.col(c) for c in probe.columns]),
            # row-unique disambiguator: spreads identical duplicate rows.
            # Not stable across task retries — harmless here, since the
            # join result is salt-invariant by construction.
            F.monotonically_increasing_id(),
        ),
        F.lit(salt_buckets),
    ).cast("int")
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    joined = p.join(b, on=[on, "__salt"], how=how)
    return joined.drop("__salt")

"""User-defined-function surface (SURVEY.md §2B last rows).

The reference's entire engine is two UDF slots: ``mapf`` (generalized
UDTF, mr/worker.go:36) and ``reducef`` (full-list UDAF,
mr/worker.go:37), shipped as Go plugins. Our equivalents, fastest
first:

- built-in Column expressions (JVM codegen — everything else in this
  package);
- Arrow-vectorized ``pandas_udf`` scalar / GROUPED_AGG (this module);
- ``mapInPandas`` / ``applyInPandas`` (the MapReduce façade,
  engine/mapreduce.py — exact mapf/reducef semantics);
- row-at-a-time ``F.udf`` — deliberately absent from the inventory:
  10-100× slower than the Arrow path, never the right choice in a
  hot loop.

Both queries here are oracle-checked: the UDF bodies are pure IEEE
double arithmetic, bit-identical between pandas and DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


def _disc_price_udf():
    # built lazily: pandas_udf parses its DDL return type against the
    # active session, so decorating at import time would require one
    @pandas_udf("double")
    def _disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        # Arrow batch in, Arrow batch out: one Python call per ~10k
        # rows, vectorized numpy multiply inside.
        return price * (1.0 - discount)

    return _disc_price


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_quantity >= 45
""",
    doc=(
        "Vectorized scalar pandas_udf (Arrow transport). The predicate "
        "still pushes to the scan — only surviving rows cross into Python."
    ),
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    disc_price = _disc_price_udf()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price(F.col("l_extendedprice"), F.col("l_discount")).alias("disc_price"),
    )


def _harmonic_mean_udf():
    @pandas_udf("double")
    def _harmonic_mean(x: pd.Series) -> float:
        # GROUPED_AGG shape: Series in, scalar out, one call per group.
        return float(len(x) / (1.0 / x).sum())

    return _harmonic_mean


@register(
    "udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       CAST(round(count(*) / SUM(1.0 / l_quantity), 4) AS DOUBLE) AS harmonic_qty
FROM lineitem
GROUP BY l_returnflag
""",
    doc=(
        "Custom aggregate as a GROUPED_AGG pandas_udf (harmonic mean). "
        "Unlike the reference's reducef this is NOT handed a materialized "
        "value list per key by the engine contract — but like reducef it is "
        "not partial-aggregatable, so Spark shuffles rows, not partial "
        "states; prefer algebraic built-ins when the math allows "
        "(SURVEY.md §4.2). Rounded: summation order is engine-defined."
    ),
    tags=("udf", "agg"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    harmonic_mean = _harmonic_mean_udf()
    return (
        li.groupBy("l_returnflag")
        .agg(harmonic_mean(F.col("l_quantity")).alias("__h"))
        .select("l_returnflag", F.round(F.col("__h"), 4).alias("harmonic_qty"))
    )


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
       * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS rev_c2
FROM lineitem
""",
    doc=(
        "mapInArrow: the zero-copy end of the Python UDF spectrum — "
        "RecordBatches flow Arrow→Arrow with no pandas conversion, the "
        "right slot for columnar kernels (pyarrow.compute, numpy over "
        "buffers) and binary payloads. Body computes discounted "
        "revenue entirely in int64 cents×percent (ROUND→cast like the "
        "histogram query, so pyarrow's half-to-even tie mode can never "
        "bite: the inputs are 2-decimal values whose ×100 images sit "
        "at integers, never at .5 ties) — bit-identical to the DuckDB "
        "oracle. Map-only: zero shuffle, pipelines with the scan."
    ),
    tags=("udf",),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
            disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
            rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), rev],
                ["l_orderkey", "l_linenumber", "rev_c2"],
            )

    li = io.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        kernel, "l_orderkey long, l_linenumber int, rev_c2 long"
    )


@register(
    "udf_arrow_grouped_agg",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_c2,
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) // count(*)
            AS BIGINT) AS avg_qty_c
FROM lineitem GROUP BY l_returnflag
""",
    doc=(
        "groupBy(...).applyInArrow (Spark 4): the Arrow-native grouped "
        "twin of udf_grouped_agg — the engine hands the WHOLE group as "
        "one pyarrow Table (the closest modern analogue of the "
        "reference's full-value-list reducef contract, mr/worker.go:149, "
        "with zero pandas conversion on either side). Body aggregates "
        "in int64 cents (ROUND→cast, the udf_map_in_arrow tie-safety "
        "argument) so sums are exact and order-independent, and the "
        "mean is FLOOR-integer cents (Σqty_c div n) — zero floats in "
        "the output, nothing for engines to tie-break. Like reducef "
        "it is not partial-aggregatable: rows shuffle, not partial "
        "states — the inventory carries the algebraic built-in path "
        "(pricing_summary) alongside for the trade."
    ),
    tags=("udf", "agg"),
)
def udf_arrow_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_group(table: "pa.Table") -> "pa.Table":
        cents = pc.cast(
            pc.round(pc.multiply(table.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        disc = pc.cast(
            pc.round(pc.multiply(table.column("l_discount"), 100.0)), pa.int64()
        )
        qty_c = pc.cast(
            pc.round(pc.multiply(table.column("l_quantity"), 100.0)), pa.int64()
        )
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
        n = table.num_rows
        sum_qty_c = pc.sum(qty_c).as_py()
        return pa.Table.from_pydict(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n": [n],
                "revenue_c2": [pc.sum(rev).as_py()],
                "avg_qty_c": [sum_qty_c // n],
            },
            schema=pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("n", pa.int64()),
                    ("revenue_c2", pa.int64()),
                    ("avg_qty_c", pa.int64()),
                ]
            ),
        )

    li = io.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.groupBy("l_returnflag").applyInArrow(
        per_group,
        "l_returnflag string, n bigint, revenue_c2 bigint, avg_qty_c bigint",
    )


@register(
    "udtf_trigram_explode",
    oracle=r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[^\p{L}]+'), t -> t <> '') AS tk
  FROM documents
),
long AS (
  SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
  FROM base
  WHERE len(tk) >= 3
)
SELECT doc_id, CAST(i AS INT) AS pos, array_to_string(tk[i:i+2], ' ') AS ngram
FROM long
""",
    doc=(
        "Python UDTF (Spark 4 user-defined TABLE function) in a LATERAL "
        "join: one (pos, trigram) row per token window per document — "
        "the closest Spark-native analogue of the reference's mapf slot "
        "itself (mr/worker.go:36: one call emits MANY rows; scalar UDFs "
        "cannot change cardinality, UDTFs can). Tokenization inside the "
        "UDTF is apps._letter_runs — the unicode.IsLetter-exact run "
        "splitter already parity-proven against the \\p{L} oracle split "
        "(tests/test_tokenizer.py) — so the DuckDB mirror is the same "
        "trigram windows via list slicing. Python-per-row is the honest "
        "cost of the generalized-UDTF surface; the JVM fast path for "
        "THIS specific shape (transform+sequence+explode) is what "
        "doc_chunk_windows/text_repetition_metrics use — the inventory "
        "carries both so the trade is explicit."
    ),
    tags=("udf", "text"),
)
def udtf_trigram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    from tda596_lab02mapreduce_spark.apps import _letter_runs

    @udtf(returnType="pos int, ngram string")
    class Trigrams:
        def eval(self, text: str):
            toks = _letter_runs(text or "")
            for i in range(1, len(toks) - 1):
                yield i, " ".join(toks[i - 1 : i + 2])

    spark.udtf.register("q_trigrams", Trigrams)
    io.register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.ngram "
        "FROM documents d, LATERAL q_trigrams(d.text) t"
    )


@register(
    "pandas_api_groupby",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders GROUP BY o_orderstatus
""",
    doc=(
        "pandas-on-Spark API surface (pyspark.pandas): the same "
        "per-status rollup written as idiomatic pandas — "
        "read_parquet → assign → groupby → agg → reset_index — and "
        "converted back with to_spark(). The point is the MIGRATION "
        "surface: pandas code runs distributed with no rewrite, and "
        "the plan Catalyst sees is the same partial+final aggregate "
        "the DataFrame form produces (pandas-on-Spark compiles to "
        "DataFrame ops, not to a driver-side pandas). Money in "
        "integer cents so the sum is exact."
    ),
    tags=("udf", "api", "agg"),
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # through io.load (the one ingestion chokepoint) and with an
    # explicit index_col — the default distributed-sequence index
    # costs an extra index-attachment job that to_spark() discards
    psdf = io.load(spark, sf_dir, "orders").pandas_api(index_col="o_orderkey")
    psdf = psdf.assign(cents=(psdf.o_totalprice * 100).round(0).astype("int64"))
    out = (
        psdf.groupby("o_orderstatus")
        .agg(n_orders=("o_custkey", "count"), sum_cents=("cents", "sum"))
        .reset_index()
    )
    return out.to_spark().select(
        "o_orderstatus",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    )


@register(
    "udf_cogroup_asof",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us, event_id AS c_id
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.p_us,
       cb.c_us AS click_us,
       p.p_us - cb.c_us AS gap_us
FROM p LEFT JOIN LATERAL (
  SELECT c_us FROM c
  WHERE c.user_id = p.user_id AND c.c_us <= p.p_us
        AND p.p_us - c.c_us <= 3600000000
  ORDER BY c_us DESC, c_id DESC LIMIT 1
) cb ON TRUE
""",
    doc=(
        "cogroup().applyInPandas — the two-sided grouped-UDF slot "
        "(the API surface the one-sided applyInPandas and the "
        "streaming applyInPandasWithState don't cover): purchases and "
        "clicks cogrouped per user, matched backward-as-of (latest "
        "click ≤ purchase, 1 h tolerance) with numpy searchsorted "
        "inside the pandas function — the pattern for per-key merge "
        "logic that genuinely needs both sides materialized (custom "
        "as-of variants, per-key reconciliation, trajectory stitching)"
        ".  Times cross the boundary as int64 microseconds, never "
        "datetimes, so no tz/unit coercion can bite; ties on click "
        "time resolve to the max event_id (clicks stable-sorted by "
        "(c_us, c_id), merge_asof takes the last match).  KEY LESSON "
        "measured at sf0.1: cogrouping on the raw user key paid ~3 ms "
        "of per-group Arrow/pandas setup × 1500 users ≈ 4.7 s for a "
        "TRIVIAL body — so the registered plan cogroups on a HASH "
        "BUCKET of the user (a function of user_id, so correctness "
        "is untouched) and lets pd.merge_asof(by='user_id') do the "
        "per-user matching inside one vectorized call: 7.1 s → 1.3 s, "
        "and at 1e8 users the difference is hours of pure overhead.  "
        "The declarative twin is join_asof_purchase_click (0.7 s — "
        "still 2× faster: stay declarative when built-ins can express "
        "the semantics); this registers the ESCAPE HATCH with the "
        "same oracle discipline (LEFT LATERAL limit-1)."
    ),
    tags=("udf", "join", "timeseries"),
)
def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    ev = io.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("c_us"), F.col("event_id").alias("c_id")
    )

    # Cogroup on a HASH BUCKET of the user, not the user itself: the
    # FlatMapCoGroupsInPandas frame costs ~3 ms of Arrow/pandas setup
    # PER GROUP, so user-grain groups paid 1500 × 3 ms ≈ 4.7 s at
    # sf0.1 for a trivial body (measured) — and at 1e8 users the same
    # shape is hours of pure overhead. Bucketing amortizes it: each
    # pandas call receives MANY users and pd.merge_asof(by="user_id")
    # does the per-user backward match inside one vectorized call.
    # Correctness is untouched — the bucket is a function of user_id,
    # so both sides of a user always meet in the same group.
    B = 64

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "p_us", "click_us", "gap_us"]
            )
        l = left.sort_values("p_us", kind="mergesort")[
            ["event_id", "user_id", "p_us"]
        ]
        if right.empty:
            n = len(l)
            out = l.copy()
            out["click_us"] = pd.array([None] * n, dtype="Int64")
            out["gap_us"] = pd.array([None] * n, dtype="Int64")
            return out
        # ties on c_us: stable-sorted by (c_us, c_id), merge_asof takes
        # the LAST matching row → max event_id, same contract as before
        r = right.sort_values(["c_us", "c_id"], kind="mergesort")[
            ["user_id", "c_us"]
        ]
        m = pd.merge_asof(
            l,
            r,
            left_on="p_us",
            right_on="c_us",
            by="user_id",
            direction="backward",
            tolerance=3_600_000_000,
        )
        # int64 micros (~1.7e15) are exactly representable in float64
        # (< 2^53), so the NaN-bearing float round-trip is lossless
        ok = m["c_us"].notna().to_numpy()
        cand = np.where(ok, m["c_us"].fillna(0).to_numpy(dtype=np.int64), 0)
        gap = m["p_us"].to_numpy(dtype=np.int64) - cand
        m["click_us"] = pd.arrays.IntegerArray(cand, mask=~ok)
        m["gap_us"] = pd.arrays.IntegerArray(gap, mask=~ok)
        return m[["event_id", "user_id", "p_us", "click_us", "gap_us"]]

    pb = p.withColumn("__b", F.pmod(F.col("user_id"), F.lit(B)))
    cb = c.withColumn("__b", F.pmod(F.col("user_id"), F.lit(B)))
    return (
        pb.groupBy("__b")
        .cogroup(cb.groupBy("__b"))
        .applyInPandas(
            asof,
            "event_id long, user_id long, p_us long, click_us long, gap_us long",
        )
    )


@register(
    "udf_cogroup_arrow_reconcile",
    oracle="""
WITH lb AS (
  SELECT l_orderkey % 64 AS bucket,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS li_cents
  FROM lineitem GROUP BY bucket
),
ob AS (
  SELECT o_orderkey % 64 AS bucket,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS ord_cents
  FROM orders GROUP BY bucket
)
SELECT COALESCE(lb.bucket, ob.bucket) AS bucket,
       COALESCE(lb.n_lines, 0) AS n_lines,
       COALESCE(lb.li_cents, 0) AS li_cents,
       COALESCE(ob.n_orders, 0) AS n_orders,
       COALESCE(ob.ord_cents, 0) AS ord_cents
FROM lb FULL OUTER JOIN ob ON lb.bucket = ob.bucket
""",
    doc=(
        "cogroup(...).applyInArrow (Spark 4): the Arrow-native "
        "COGROUPED twin of udf_cogroup_asof — both sides of each "
        "bucket arrive as raw pyarrow Tables (zero pandas conversion), "
        "here reconciling lineitem revenue against order headers per "
        "orderkey bucket in exact int64 cents. Completes the "
        "grouped-UDF matrix: pandas grouped / pandas cogrouped / "
        "arrow grouped / arrow cogrouped. The key is a 64-way hash "
        "bucket of the orderkey, NOT the raw key — the measured "
        "~3 ms-per-group Arrow overhead (udf_cogroup_asof lesson) "
        "makes key-grain cogroups a scale trap; bucket grain keeps "
        "group count fixed and group size growing, which is the "
        "right direction for the Arrow batch path. Oracle is the "
        "algebraic two-rollup FULL OUTER join."
    ),
    tags=("udf", "agg", "join"),
)
def udf_cogroup_arrow_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def reconcile(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        # left = lineitem rows of this bucket, right = orders rows;
        # either side may be EMPTY (cogroup contract) — the bucket key
        # must then come from the non-empty side.
        if left.num_rows:
            bucket = left.column("bucket")[0].as_py()
        else:
            bucket = right.column("bucket")[0].as_py()
        li_cents = (
            pc.sum(
                pc.cast(
                    pc.round(pc.multiply(left.column("l_extendedprice"), 100.0)),
                    pa.int64(),
                )
            ).as_py()
            or 0
        ) if left.num_rows else 0
        ord_cents = (
            pc.sum(
                pc.cast(
                    pc.round(pc.multiply(right.column("o_totalprice"), 100.0)),
                    pa.int64(),
                )
            ).as_py()
            or 0
        ) if right.num_rows else 0
        return pa.Table.from_pydict(
            {
                "bucket": [bucket],
                "n_lines": [left.num_rows],
                "li_cents": [li_cents],
                "n_orders": [right.num_rows],
                "ord_cents": [ord_cents],
            },
            schema=pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("n_lines", pa.int64()),
                    ("li_cents", pa.int64()),
                    ("n_orders", pa.int64()),
                    ("ord_cents", pa.int64()),
                ]
            ),
        )

    li = io.load(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 64).alias("bucket"), "l_extendedprice"
    )
    o = io.load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 64).alias("bucket"), "o_totalprice"
    )
    return (
        li.groupBy("bucket")
        .cogroup(o.groupBy("bucket"))
        .applyInArrow(
            reconcile,
            "bucket bigint, n_lines bigint, li_cents bigint, "
            "n_orders bigint, ord_cents bigint",
        )
    )

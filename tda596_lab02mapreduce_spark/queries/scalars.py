"""Scalar-function band of SURVEY.md §2B: string, date/time, math,
array, and JSON functions — the reference only ever had these inside
plugin Go code (tokenizer mrapps/wc.go:21-24, strconv at wc.go:39).

All expressions are built-in pyspark.sql.functions: JVM-side, inside
whole-stage codegen. Cross-engine determinism rules:
- only IEEE-exact math in oracle-checked outputs (+ - * / sqrt abs
  floor ceil mod); libm-dependent funcs (log/exp/trig) differ in the
  last ulp between JVM and C++ and live in rows-only queries;
- array folds use F.aggregate (left-to-right, bit-stable) mirrored by
  DuckDB list_reduce;
- timestamps project as dates, epoch micros, or extracted ints.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


@register(
    "scalar_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substring(p_type, 1, 5) AS type_prefix,
       concat_ws('-', p_brand, p_type) AS brand_type,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       regexp_replace(p_type, ' ', '_') AS type_snake,
       trim(p_name) AS name_trim,
       reverse(p_brand) AS brand_rev
FROM part
""",
    doc="String scalar functions over part.",
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = io.load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "scalar_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INTEGER) AS days_to_2026,
       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus_30,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
""",
    doc="Date/time scalar functions over orders (ms-precision timestamps projected as dates/ints).",
    tags=("scalar", "date"),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).alias("order_year"),
        F.month(od).alias("order_month"),
        F.dayofmonth(od).alias("order_day"),
        F.quarter(od).alias("order_quarter"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.datediff(F.lit("2026-01-01").cast("date"), od.cast("date")).alias("days_to_2026"),
        F.date_add(od.cast("date"), 30).cast("timestamp").alias("plus_30"),
        F.last_day(od.cast("date")).alias("month_end"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000.0) AS abs_dev,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
       sqrt(l_quantity) AS qty_sqrt,
       mod(CAST(l_orderkey AS BIGINT), 7) AS key_mod7,
       l_extendedprice / l_quantity AS unit_price,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
WHERE l_quantity > 0
""",
    doc="IEEE-exact math scalars (abs/floor/ceil/sqrt/mod/div/greatest/least).",
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "scalar_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
FROM events
""",
    doc=(
        "JSON extraction from events.props: Spark from_json with an explicit "
        "schema (never schema inference over 100 TB); oracle uses DuckDB's JSON "
        "extension."
    ),
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_val"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


@register(
    "scalar_array",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(embedding[1] AS DOUBLE) AS e0,
       list_reduce(list_prepend(0.0, CAST(embedding[1:8] AS DOUBLE[])), (acc, x) -> acc + x) AS sum8,
       CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS vec_max,
       CAST(list_contains(CAST(embedding AS DOUBLE[]), 0.0) AS BOOLEAN) AS has_zero
FROM embeddings
""",
    doc=(
        "Array functions over embedding: array<float>: size, element access, "
        "left-to-right fold (F.aggregate ≡ list_reduce with 0.0 seed — "
        "bit-stable), max, membership."
    ),
    tags=("scalar", "array"),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = io.load(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(vec, 1).alias("e0"),
        F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda a, x: a + x).alias("sum8"),
        F.array_max(vec).alias("vec_max"),
        F.array_contains(vec, 0.0).alias("has_zero"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       CAST(o_totalprice > 200000 AS BOOLEAN) AS is_big
FROM orders
""",
    doc="Conditional scalars: CASE WHEN, COALESCE/NULLIF, boolean projection.",
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        (F.col("o_totalprice") > 200000).alias("is_big"),
    )


@register(
    "scalar_math_libm",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(ln(l_extendedprice), 6) AS ln_price,
       ROUND(exp(l_discount), 6) AS exp_disc,
       ROUND(pow(l_quantity, 2.0), 6) AS qty_sq,
       ROUND(sin(l_tax), 6) AS sin_tax
FROM lineitem WHERE l_extendedprice > 0
""",
    doc=(
        "Transcendental math (ln/exp/pow/sin) with a rounded-margin "
        "hash oracle (round 10, VERDICT r9 #5 — the bm25/keyword-"
        "extraction rank-on-rounded discipline applied to raw libm "
        "outputs): JVM Math.* and C++ libm may differ in the last few "
        "ulps (|Δ| ≤ ~2 ulp ≈ 5e-15 for ln on this range), so BOTH "
        "engines round every transcendental to 6 dp, and the pytest "
        "margin test proves no fixture value sits within 1e-7 of a "
        "0.5·10⁻⁶ rounding boundary (measured min margin 1.7e-6 at "
        "sf0.01 AND sf0.1 — ≥200× the combined libm-drift + "
        "multiply-rounding bound of ~7e-9 in boundary units), so the "
        "rounded doubles are bit-identical cross-engine. A 9 dp "
        "variant was probed and REJECTED: ln(l_extendedprice)·1e9 "
        "lands exactly on a .5 boundary for at least one sf0.01 row."
    ),
    tags=("scalar", "math"),
)
def scalar_math_libm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.round(F.pow(F.col("l_quantity"), 2.0), 6).alias("qty_sq"),
        F.round(F.sin(F.col("l_tax")), 6).alias("sin_tax"),
    )


@register(
    "scalar_variant_json",
    oracle="""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NULL) AS BIGINT) AS n_no_extra
FROM events
GROUP BY 1
""",
    doc=(
        "Semi-structured access via Spark 4's VARIANT type: parse_json "
        "once into an open-schema value, then variant_get typed path "
        "extraction — the schema-on-read alternative to scalar_json's "
        "from_json(explicit schema). Unlike from_json, VARIANT keeps "
        "the full document queryable without declaring its shape up "
        "front (the training-metadata reality where every source adds "
        "its own props keys); try_variant_get on an absent path yields "
        "NULL instead of failing, counted here to pin that contract. "
        "Binary-encoded and columnar at rest — no per-query re-parse "
        "of the JSON text once materialized."
    ),
    tags=("scalar", "json"),
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    return (
        v.select(
            F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
            F.expr("try_variant_get(v, '$.missing', 'string')").alias("extra"),
        )
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("extra").isNull(), 1)).alias("n_no_extra"),
        )
    )


@register(
    "scalar_map",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         map(['qty','gross','net'],
             [CAST(l_quantity AS DOUBLE),
              l_extendedprice,
              l_extendedprice * (1 - l_discount)]) AS mp
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(map_extract(mp, 'net')[1] AS DECIMAL(18,6))) AS DOUBLE) AS net_sum,
       CAST(min(cardinality(mp)) AS INTEGER) AS min_keys,
       min(array_to_string(list_sort(map_keys(mp)), ',')) AS keys_str,
       CAST(count(*) FILTER (
            WHERE len(list_filter(map_values(mp), x -> x >= 1000)) > 0
       ) AS BIGINT) AS n_any_big
FROM m
GROUP BY l_returnflag
""",
    doc=(
        "MapType scalar surface (SURVEY.md §2B array/map/JSON row, the "
        "map third): per-row map construction, typed element_at lookup, "
        "map_keys/map_values introspection, and a lambda filter over "
        "values — each reduced to flat scalars before aggregation so "
        "the driver canonicalizer sees only hashable columns. The 'net' "
        "entry is summed through the decimal-cast pattern (bitwise "
        "double parity with DuckDB, queries/relational.py docstring); "
        "key enumeration is sorted before joining because map iteration "
        "order is an implementation detail on BOTH engines."
    ),
    tags=("scalar", "map"),
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    mp = F.create_map(
        F.lit("qty"), F.col("l_quantity").cast("double"),
        F.lit("gross"), F.col("l_extendedprice"),
        F.lit("net"), F.col("l_extendedprice") * (1 - F.col("l_discount")),
    )
    rows = li.select(
        "l_returnflag",
        F.element_at(mp, "net").alias("net"),
        F.size(mp).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(mp)), ",").alias("keys_str"),
        (F.size(F.filter(F.map_values(mp), lambda x: x >= 1000)) > 0).alias("any_big"),
    )
    return rows.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("net").cast("decimal(18,6)")).cast("double").alias("net_sum"),
        F.min("n_keys").cast("int").alias("min_keys"),
        F.min("keys_str").alias("keys_str"),
        F.count(F.when(F.col("any_big"), 1)).alias("n_any_big"),
    )


@register(
    "scalar_try_arith",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_linenumber = 1) AS BIGINT) AS n_div_null,
       CAST(SUM(CAST(CASE WHEN l_linenumber = 1 THEN NULL
                          ELSE l_extendedprice / (l_linenumber - 1) END
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_unit_div,
       CAST(count(TRY_CAST(l_returnflag AS INTEGER)) AS BIGINT) AS n_flag_numeric,
       CAST(SUM(TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER)) AS BIGINT) AS sum_linenos
FROM lineitem
GROUP BY l_returnflag
""",
    doc=(
        "ANSI-mode error-safe arithmetic: under Spark 4's default ANSI "
        "semantics a division by zero or an invalid cast THROWS (the "
        "correct default for a pipeline — silent nulls hide data bugs); "
        "try_divide / try_cast are the explicit opt-in to NULL-on-error "
        "for the rows where failure is expected. Here l_linenumber=1 "
        "rows produce a zero denominator (counted NULL, excluded from "
        "the decimal-cast sum) and the alphabetic return flag never "
        "parses as an integer (count = 0), while a numeric round-trip "
        "cast always succeeds. The oracle mirrors try_cast with "
        "DuckDB's TRY_CAST and guards the division with CASE — DuckDB "
        "division by zero also errors, so both engines are exercising "
        "their error path, not a silently-null one."
    ),
    tags=("scalar", "conditional"),
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    unit_div = F.try_divide(
        F.col("l_extendedprice"), (F.col("l_linenumber") - 1).cast("double")
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_linenumber") == 1, 1)).alias("n_div_null"),
        F.sum(unit_div.cast("decimal(18,6)")).cast("double").alias("sum_unit_div"),
        F.count(F.col("l_returnflag").try_cast("int")).alias("n_flag_numeric"),
        F.sum(F.col("l_linenumber").cast("string").try_cast("int")).alias(
            "sum_linenos"
        ),
    )


@register(
    "scalar_url_parse",
    oracle=r"""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || doc_id || '?lang=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
       regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\?lang=([a-z]+)', 1) AS lang_param
FROM u
""",
    doc=(
        "URL dissection for web-corpus curation (domain-level source "
        "mixing, per-host dedup, crawl filtering): deterministic URLs "
        "synthesized from doc fields, then host / path / query-param "
        "extracted with Spark's parse_url — the JVM java.net parser, "
        "not regex — while the oracle recomputes the same pieces with "
        "RE2 regexes. Structural parser vs regex agreeing on every row "
        "is the point: it pins that the synthesized URLs stay inside "
        "the subset where both readings coincide. Row-local, zero "
        "shuffle."
    ),
    tags=("scalar", "text"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "text_unicode_nfc",
    oracle="""
WITH aug AS (
  SELECT doc_id, text || ' cafe' || chr(769) AS raw FROM documents
)
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS n_before,
       CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after,
       md5(nfc_normalize(raw)) AS norm_md5
FROM aug
""",
    doc=(
        "Unicode NFC normalization — the text-cleaning step that makes "
        "byte-level dedup see 'cafe\\u0301' (decomposed) and 'caf\\u00e9' "
        "(composed) as the same document. The fixture corpus is ASCII "
        "(where NFC is the identity), so every row gets a DECOMPOSED "
        "suffix appended first; the normalized text must then be one "
        "code point shorter and hash equal across engines. Spark has "
        "no NFC builtin, so this is an Arrow-batched pandas UDF over "
        "unicodedata.normalize — the documented slow-path exception "
        "(SURVEY.md §2B UDF row); DuckDB's native nfc_normalize is the "
        "oracle, pinning that both Unicode implementations agree."
    ),
    tags=("scalar", "text", "udf"),
)
def text_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)

    docs = io.load(spark, sf_dir, "documents")
    # decomposed on purpose (e + U+0301), spelled as an escape so an
    # editor NFC pass cannot silently compose it and blank the test
    raw = F.concat(F.col("text"), F.lit(" cafe\u0301"))
    return docs.select(
        "doc_id",
        F.length(raw).cast("long").alias("n_before"),
        F.length(nfc(raw)).cast("long").alias("n_after"),
        F.md5(F.encode(nfc(raw), "utf-8")).alias("norm_md5"),
    )

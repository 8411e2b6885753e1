"""Plan-shape assertions: the scale contract. Correct results with
the wrong plan (no pushdown, accidental cartesian, missed broadcast,
no partial aggregation) is a failure at 100 TB even when sf0.01
values match — so the plan IS part of the spec here."""

from __future__ import annotations

import re

from tda596_lab02mapreduce_spark import plans
from tda596_lab02mapreduce_spark.registry import get


def test_filter_pushdown_reaches_scan(spark, sf_correctness):
    df = get("filter_project").spark_fn(spark, sf_correctness)
    pushed = plans.pushed_filters(df)
    assert "l_shipdate" in pushed and "l_quantity" in pushed, (
        f"filters did not reach the parquet scan:\n{pushed}"
    )


def test_column_pruning_reaches_scan(spark, sf_correctness):
    df = get("filter_project").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema, "no ReadSchema in plan"
    # the scan must not read payload columns the query never touches
    assert "l_extendedprice" in scan_schema[0]
    assert "l_tax" not in scan_schema[0] and "l_discount" not in scan_schema[0]


def test_dim_join_broadcasts(spark, sf_correctness):
    df = get("join_broadcast_dim").spark_fn(spark, sf_correctness)
    assert plans.has_broadcast_join(df), "dimension join should broadcast"
    assert not plans.has_operator(df, "CartesianProduct")


def test_theta_join_is_not_cartesian(spark, sf_correctness):
    df = get("join_theta_pairs").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")


def test_wordcount_has_partial_aggregation(spark, sf_correctness):
    """The map-side combine the reference lacks (SURVEY.md §4.2): the
    plan must show a partial_count before the shuffle."""
    df = get("wordcount").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "partial_count" in plan or "partial count" in plan.lower(), plan


def test_topk_uses_take_ordered(spark, sf_correctness):
    df = get("topk_orders").spark_fn(spark, sf_correctness)
    assert plans.has_operator(df, "TakeOrderedAndProject"), (
        "limit+orderBy should plan TakeOrderedAndProject, not a global sort"
    )


def test_asof_join_single_shuffle(spark, sf_correctness):
    """The as-of join must not plan a range-explosion join — one
    Exchange for the window, no nested-loop join."""
    df = get("join_asof_purchase_click").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "BroadcastNestedLoopJoin|CartesianProduct")


def test_wholestage_codegen_everywhere_hot(spark, sf_correctness):
    df = get("pricing_summary").spark_fn(spark, sf_correctness)
    # AQE hides codegen annotations until the plan is finalized by a run
    plan = plans.executed_plan(df)
    assert re.search(r"(?i)codegen id", plan), (
        "agg pipeline fell out of whole-stage codegen:\n" + plan[:2000]
    )


def test_exists_subquery_plans_semi_join(spark, sf_correctness):
    df = get("subquery_exists").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "LeftSemi" in plan, "EXISTS should rewrite to a left-semi join:\n" + plan[:1500]


def test_not_in_subquery_plans_anti_join(spark, sf_correctness):
    df = get("subquery_not_in").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "LeftAnti" in plan, "NOT IN should rewrite to a left-anti join:\n" + plan[:1500]


def test_multi_join_topk_no_cartesian_and_takeordered(spark, sf_correctness):
    df = get("multi_join_topk").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")
    assert plans.has_operator(df, "TakeOrderedAndProject")


def test_regional_revenue_broadcasts_dims(spark, sf_correctness):
    df = get("regional_revenue").spark_fn(spark, sf_correctness)
    assert plans.has_broadcast_join(df)
    assert not plans.has_operator(df, "CartesianProduct")


def test_resize_is_map_only(spark, sf_correctness):
    """Blob resize must not shuffle: scan → mapInPandas → project,
    zero Exchange — the whole point of resizing BEFORE any wide op is
    that only small blobs ever ride a shuffle."""
    df = get("multimodal_resize").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "Exchange" not in plan, plan


def test_salted_join_joins_on_salt(spark, sf_correctness):
    """The salted join's physical join keys must include the salt
    column — otherwise salting silently degraded to a plain key join
    and a hot key still lands whole on one task."""
    df = get("join_salted_skew").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "__salt" in plan, plan
    assert not plans.has_operator(df, r"CartesianProduct")


def test_ivf_plan_no_cartesian(spark, sf_correctness):
    """IVF's probe must stay an equi-join on cell id; a cartesian here
    means the ANN index degenerated to brute force over all pairs."""
    df = get("similarity_ivf_topk").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, r"CartesianProduct")


def test_dedup_signatures_not_recomputed_in_scan_filter(spark, sf_correctness):
    """Constraint-inference blowup guard: a threshold filter over a
    signature-derived column (hamming/jaccard) must NOT materialize an
    inferred isnotnull(<whole signature fold>) inside the parquet
    scan's DataFilters — that re-evaluates the fold twice per side
    (2.9s → 1.5s at sf0.1 when fixed). Non-nullable signature output
    (coalesce) keeps the inferred constraint constant-foldable."""
    for name in ("dedup_simhash", "dedup_minhash_lsh"):
        df = get(name).spark_fn(spark, sf_correctness)
        plan = plans.formatted_plan(df)
        for line in plan.splitlines():
            if "PushedFilters" in line or "DataFilters" in line:
                assert "aggregate(" not in line, f"{name}: fold pushed into scan: {line}"


def test_bucketed_join_query_has_no_exchange_under_join(spark, sf_correctness):
    """join_bucketed_revenue's sort-merge join must read the bucketed
    layout directly: no Exchange may feed the join (the later groupBy
    legitimately shuffles on o_orderpriority)."""
    df = get("join_bucketed_revenue").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" in plan, plan[:1500]
    join_part = plan.split("SortMergeJoin", 1)[1]
    # everything below the join (the plan prints children after the
    # node) must be scan-only: no hashpartitioning on the join key
    before_agg = plan.split("SortMergeJoin", 1)[1]
    assert "hashpartitioning(o_orderkey" not in before_agg, plan[:2000]
    assert "hashpartitioning(l_orderkey" not in before_agg, plan[:2000]


def test_unpivot_is_shuffle_free(spark, sf_correctness):
    """Wide-to-long must be a row-local Expand — any Exchange means
    the reshape is moving data it doesn't need to."""
    df = get("unpivot_part_metrics").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "Exchange"), plans.formatted_plan(df)


def test_gapfill_spine_join_broadcasts(spark, sf_correctness):
    """The dense-grid join must broadcast the O(hours x series) spine
    side, never shuffle the grid as if it were data-sized, and never
    degrade to a cartesian."""
    df = get("timeseries_gapfill").spark_fn(spark, sf_correctness)
    assert plans.has_broadcast_join(df)
    assert not plans.has_operator(df, "CartesianProduct")


def test_upsert_is_single_full_outer_join(spark, sf_correctness):
    """The merge is exactly one full-outer equi-join on the key — no
    nested loop, no second pass over the base table."""
    df = get("upsert_customer_batch").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "FullOuter" in plan, plan
    assert not plans.has_operator(df, "CartesianProduct")
    assert not plans.has_operator(df, "BroadcastNestedLoop")


def test_centroid_aggregation_is_partial_final(spark, sf_correctness):
    """posexplode blows rows up 64x; the mean must still aggregate
    map-side first (partial collect_list per input split) so only
    per-group state crosses the wire."""
    df = get("vector_centroid_by_label").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "ObjectHashAggregate" in plan or "HashAggregate" in plan, plan
    assert not plans.has_operator(df, "CartesianProduct")


def test_sessionize_single_exchange(spark, sf_correctness):
    """The lag window, the session-numbering window, and the
    (user, session) rollup must all ride ONE hash partitioning on
    user_id — a second Exchange here re-shuffles the event stream for
    nothing at 100 TB."""
    df = get("sessionize_events").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert len(re.findall(r"\(\d+\) \w*Exchange", plan)) == 1, plan


def test_decontaminate_is_equi_join(spark, sf_correctness):
    """Train-vs-test shingle matching must be an equi-join on the
    shingle key (broadcast or shuffled), never a nested-loop over
    train×test docs."""
    df = get("decontaminate_train_split").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")
    assert not plans.has_operator(df, "BroadcastNestedLoop")


def test_histogram_is_single_partial_final_aggregate(spark, sf_correctness):
    """Row-local binning, then exactly one Exchange on the bucket id
    with a partial HashAggregate below it — the shuffle carries
    ~#buckets rows per partition, not the scan."""
    df = get("histogram_extendedprice").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert len(re.findall(r"\(\d+\) \w*Exchange", plan)) == 1, plan
    assert "partial" in plan.lower(), plan


def test_anomaly_stats_broadcast_back(spark, sf_correctness):
    """The per-type stats (rows = #event types) must come back to the
    scan as a broadcast — shuffling the event stream to meet its own
    5-row statistics table would be backwards at 100 TB."""
    df = get("anomaly_zscore_events").spark_fn(spark, sf_correctness)
    assert plans.has_broadcast_join(df), plans.formatted_plan(df)
    assert not plans.has_operator(df, "CartesianProduct")


def test_cdc_latest_uses_window_group_limit(spark, sf_correctness):
    """rn=1 over the key window must trigger Spark's WindowGroupLimit
    (per-partition top-1 before/after the shuffle) — without it the
    compaction materializes a full sorted window per key."""
    df = get("cdc_latest_per_user").spark_fn(spark, sf_correctness)
    assert plans.has_operator(df, "WindowGroupLimit"), plans.formatted_plan(df)


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_correctness):
    """Runtime semi-join reduction: when a selective filter sits on one
    side of a shuffle join, Catalyst should build a Bloom filter from
    the filtered side and push a might_contain probe into the other
    side's scan stage — at 100 TB this drops most probe rows BEFORE
    the exchange. (Broadcast is disabled here to force the shuffle
    path where the bloom matters; the scan-size threshold is lowered
    because local fixtures are tiny.)"""
    from tda596_lab02mapreduce_spark import io
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ord_ = io.load(spark, sf_correctness, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = io.load(spark, sf_correctness, "lineitem")
        j = (
            li.join(ord_, li.l_orderkey == ord_.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plans.formatted_plan(j)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def test_null_safe_join_stays_equi_join(spark, sf_correctness):
    """<=> must remain a hash-partitionable join key — a nested loop
    over the NULL bucket would be quadratic at scale."""
    df = get("join_null_safe_cohorts").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")
    assert not plans.has_operator(df, "BroadcastNestedLoop")


def test_grouped_topk_uses_window_group_limit(spark, sf_correctness):
    df = get("topk_per_segment").spark_fn(spark, sf_correctness)
    assert plans.has_operator(df, "WindowGroupLimit"), plans.formatted_plan(df)


def test_partition_pruning_is_metadata_only(spark, sf_correctness):
    """source_partition_pruning's event_type predicate must surface as
    a PartitionFilters entry on the scan (directory-level pruning,
    decided from the listing — no file of another event_type is ever
    opened), NOT as a post-scan data Filter over all partitions."""
    df = get("source_partition_pruning").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), (
        f"event_type not pruned at partition level:\n{plan[:2000]}"
    )
    # and the predicate must NOT linger as a row-level filter
    data_filters = re.findall(r"Filter \(?[^\n]*event_type[^\n]*", plan)
    assert not data_filters, f"predicate re-applied per row: {data_filters}"


def test_join_strategy_hints_are_honored(spark, sf_correctness):
    """Strategy hints override the planner's size-based choice — the
    escape hatch when statistics mislead at scale (a 'small' dim that
    is small in bytes but explodes in the join). nation is far below
    the broadcast threshold, so broadcast is the default; MERGE and
    SHUFFLE_HASH hints must force the other two strategies on the
    identical query."""
    from tda596_lab02mapreduce_spark import io

    cust = io.load(spark, sf_correctness, "customer")
    nation = io.load(spark, sf_correctness, "nation")

    def joined(hinted):
        return cust.join(hinted, cust.c_nationkey == hinted.n_nationkey).groupBy(
            "n_name"
        ).count()

    assert plans.has_operator(joined(nation), "BroadcastHashJoin")
    assert plans.has_operator(joined(nation.hint("merge")), "SortMergeJoin")
    assert plans.has_operator(
        joined(nation.hint("shuffle_hash")), "ShuffledHashJoin"
    )


def test_observe_metrics_on_query_run(spark, sf_correctness):
    """df.observe: accumulator-style metrics collected DURING the run,
    no second scan — how a production pipeline watches row counts and
    quality gates at 100 TB without paying an extra aggregation job."""
    from pyspark.sql import Observation

    from tda596_lab02mapreduce_spark import io

    li = io.load(spark, sf_correctness, "lineitem")
    obs = Observation("li_metrics")
    from pyspark.sql import functions as F

    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
    )
    out = observed.groupBy("l_returnflag").count()
    rows = out.collect()
    assert rows
    m = obs.get
    assert m["n_rows"] == li.count()
    assert float(m["sum_qty"]) > 0


def test_disjunctive_join_pred_stays_equi_join(spark, sf_correctness):
    """Q19 shape: the OR-of-conjunctions must NOT degrade the join to a
    nested-loop/cartesian — the equi key is extracted and the
    disjunction filters after (or under) the hash join."""
    df = get("join_disjunctive_pred").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "BroadcastNestedLoopJoin|CartesianProduct"), (
        plans.formatted_plan(df)[:2000]
    )


def test_in_over_aggregate_plans_semi_join(spark, sf_correctness):
    """Q18 shape: IN over a grouped HAVING must become a (semi) hash
    join against the aggregated subquery, never a per-row probe."""
    df = get("subquery_in_agg").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert re.search(r"(?i)(LeftSemi|semi)", plan), plan[:2000]


def test_global_share_subquery_evaluated_once(spark, sf_correctness):
    """Q11 shape: the HAVING's global-total scalar subquery is one
    extra reduction (a Subquery/scalar-subquery node), not a rescan
    joined per group."""
    df = get("subquery_global_share").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert re.search(r"(?i)subquery", plan), plan[:1500]
    assert not plans.has_operator(df, "CartesianProduct"), plan[:1500]


def test_attribution_band_join_is_not_cartesian(spark, sf_correctness):
    """Multi-touch attribution: the touch discovery is an equi join on
    user_id with the interval condition as a post-join predicate —
    never a cartesian / nested-loop over purchases×clicks."""
    df = get("attribution_linear_touch").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct"), (
        plans.formatted_plan(df)[:2000]
    )
    plan = plans.formatted_plan(df).lower()
    assert "user_id" in plan


def test_scd2_lookup_stays_equi_join(spark, sf_correctness):
    """The point-in-time lookup must hash/sort-merge on user_id with
    the validity-interval predicate applied at the join, not degrade
    to a nested loop over purchases×intervals."""
    df = get("scd2_point_in_time").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(
        df, "BroadcastNestedLoopJoin|CartesianProduct"
    ), plans.formatted_plan(df)[:2000]


def test_quality_audit_rules_are_joins_or_scans(spark, sf_correctness):
    """Every audit rule is a keyed anti/inner join or a scan aggregate:
    no cartesian anywhere in the 8-rule union, and the referential
    rules appear as anti joins."""
    df = get("data_quality_audit").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert not plans.has_operator(df, "CartesianProduct"), plan[:2000]
    assert re.search(r"(?i)leftanti", plan), plan[:2000]


def test_knn_broadcasts_neighbors_not_corpus(spark, sf_correctness):
    """The label join must broadcast the k·|q|-row neighbor RESULT; the
    corpus-sized label projection stays partitioned (a corpus broadcast
    would not survive 100 TB)."""
    df = get("knn_label_classify").spark_fn(spark, sf_correctness)
    assert plans.has_broadcast_join(df)
    assert not plans.has_operator(df, "CartesianProduct")


def test_copurchase_pairs_generated_row_locally(spark, sf_correctness):
    """The pair pass must be collect_set + row-local explode — one
    ObjectHashAggregate on orderkey, a broadcast part probe, and NO
    self-join of the exploded (orderkey, brand) rows (the k^2 fan-out
    the oracle's textbook formulation would cost at 100 TB)."""
    df = get("copurchase_brand_pairs").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "ObjectHashAggregate") >= 1, plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")
    assert plans.count_nodes(plan, "SortMergeJoin") == 0, plan[:2000]
    # exactly: orderkey agg + pair agg (part probe is a BroadcastExchange)
    assert plans.count_nodes(plan, "Exchange") == 2, plan[:2000]


def test_collocation_totals_are_broadcast(spark, sf_correctness):
    """The two grand totals (token count N, bigram count M) must join
    as 1-row broadcasts, never shuffle against the support-filtered
    bigram table; no cartesian beyond those broadcast-tiny cross
    joins."""
    df = get("collocation_lift_bigrams").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "BroadcastNestedLoopJoin") == 2, plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_spearman_windows_share_one_partitioning(spark, sf_correctness):
    """Both rank windows and the final aggregate key on event_type:
    the plan may sort twice (x-order, y-order) but must not shuffle
    more than the keyed exchanges — no range partitioning (global
    sort) anywhere."""
    df = get("spearman_value_vs_hour").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_ewma_single_window_exchange(spark, sf_correctness):
    """All 9 lag() calls share ONE window spec: exactly one Exchange
    (user_id) and one Window operator — the lag chain must not plan
    per-lag windows or sorts."""
    df = get("ewma_dyadic_user_value").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "Window") == 1, plan[:2000]
    assert plans.count_nodes(plan, "Exchange") == 1, plan[:2000]


def test_negative_sampling_metadata_join_is_keyed(spark, sf_correctness):
    """The corpus-size scalar joins as a 1-row broadcast; the metadata
    fetch is a keyed join on neg_id — no cartesian, no corpus
    broadcast."""
    df = get("contrastive_negative_pairs").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "BroadcastNestedLoopJoin") == 1, plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_join_key_profile_joins_keys_only(spark, sf_correctness):
    """Every probe joins two distinct-reduced KEY columns: each scan
    reads exactly one column (ReadSchema), and every join is a
    full-outer hash/sort-merge — no payload columns ride the
    shuffles."""
    df = get("profile_join_keys").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert not plans.has_operator(df, "CartesianProduct")
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas, plan[:2000]
    for line in schemas:
        struct = line.split("struct<", 1)[1]
        assert "," not in struct, f"scan reads more than the key column: {line}"


def test_rfm_windows_ride_nation_key(spark, sf_correctness):
    """All three ntile windows are keyed on nationkey — no global
    (rangepartitioned single-task) window anywhere; the orders rollup
    and the windows are the only exchanges."""
    df = get("rfm_customer_segments").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_session_trigrams_share_user_partitioning(spark, sf_correctness):
    """The gap window, numbering window, and per-session collect_list
    all ride the user_id partitioning; the only other exchange is the
    trigram count. No global sort, no cartesian."""
    df = get("session_path_trigrams").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert plans.count_nodes(plan, "Exchange") == 2, plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_dynamic_partition_pruning_subquery_in_scan(spark, sf_correctness):
    """The fact scan must carry a dynamicpruningexpression(day IN
    dynamicpruning#N) partition filter — the runtime prune that skips
    non-qualifying date directories when the day set only arrives as
    data. A plain isnotnull here means the prune was lost and every
    partition is read."""
    df = get("source_dynamic_partition_pruning").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("dynamicpruning" in l for l in pf), "\n".join(pf) or plan[:2000]


def test_mad_medians_join_back_broadcast(spark, sf_correctness):
    """Both doubled-median stat tables (per-type: 5 rows) must join
    back as broadcasts; the median passes are histogram+window — no
    rangepartitioning (global sort) and no cartesian anywhere."""
    df = get("anomaly_mad_events").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "BroadcastHashJoin") >= 2, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_ohlc_is_single_aggregation(spark, sf_correctness):
    """OHLC must be ONE partial+final aggregate on (user, hour) —
    min_by/max_by carry open/close through the same shuffle as
    high/low/count. A Window or second Exchange here means the
    first/last lookup degraded to a sort or self-join."""
    df = get("timeseries_ohlc_hourly").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "Exchange") == 1, plan[:2000]
    assert plans.count_nodes(plan, "Window") == 0, plan[:2000]


def test_rolling_median_single_window(spark, sf_correctness):
    """The bounded 5-row frame must ride one user_id Exchange and one
    Window — no global sort, no per-element re-shuffles."""
    df = get("window_rolling_median").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "Exchange") == 1, plan[:2000]
    assert plans.count_nodes(plan, "Window") == 1, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]


def test_mmr_touches_corpus_once(spark, sf_correctness):
    """The greedy steps operate on localCheckpointed candidate tables:
    the corpus parquet must be scanned by the top-k pass only — the
    unrolled per-step plans must contain NO parquet scans (they read
    the checkpointed RDDs) and no cartesian."""
    df = get("similarity_mmr_rerank").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan, plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_streaks_ride_user_key(spark, sf_correctness):
    """Distinct days, the islands window, and both rollups all key on
    user_id — no global sort, no cartesian, no extra exchange beyond
    the user-keyed ones."""
    df = get("user_activity_streaks").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")


def test_skyline_windows_are_keyed(spark, sf_correctness):
    """Both dominance windows partition on the flag key (range-mode
    running max + per-price max) — no global single-task window."""
    df = get("skyline_price_quantity").spark_fn(spark, sf_correctness)
    plan = plans.final_plan(df)
    assert plans.count_nodes(plan, "Window") >= 1, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]


def test_interval_overlap_is_equi_join(spark, sf_correctness):
    """The bin decomposition must make the overlap join a HASH join:
    a CartesianProduct or BroadcastNestedLoop here means the range
    predicate leaked into the join and the plan is quadratic."""
    df = get("join_interval_overlap").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")
    assert not plans.has_operator(df, "BroadcastNestedLoop")


def test_substring_spans_no_pairs(spark, sf_correctness):
    """Span discovery is shingle-grain equi-joins + doc-keyed windows —
    never a document-pair join."""
    df = get("dedup_substring_spans").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")
    assert not plans.has_operator(df, "BroadcastNestedLoop")
    assert plans.partitionless_window_count(df) == 0


def test_keyword_topk_uses_window_group_limit(spark, sf_correctness):
    """The per-doc rank<=3 must push into the shuffle as a group limit
    (WindowGroupLimit), not materialize a full per-doc sort."""
    df = get("topk_keywords_per_doc").spark_fn(spark, sf_correctness)
    assert plans.has_operator(df, "WindowGroupLimit"), plans.formatted_plan(df)


def test_covariance_is_single_aggregate(spark, sf_correctness):
    """All 14 power sums must come from ONE partial+final aggregate —
    exactly one exchange in the whole plan."""
    df = get("stats_covariance_matrix").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 1, plan


def test_round10_band_plan_shapes(spark, sf_correctness):
    """Round-10 operators: no cartesian products anywhere, zero
    partition-less WindowExec nodes, and the blob-bearing phash plan
    never shuffles bytes (its only exchanges are on the 2-column
    (media_id, phash16) projection — asserted via exchange count, the
    blob column cannot survive the mapInPandas output schema)."""
    for name, max_exchanges in [
        ("split_temporal_holdout", 4),
        ("eb_shrunk_return_rate", 7),
        ("shard_bin_packing", 8),
        ("text_stopword_discovery", 5),
        ("frequent_triples_brand", 30),
        ("embedding_pca_project", 3),
        ("ab_test_mannwhitney_u", 9),
        ("theilsen_daily_trend", 12),
        ("ltv_cohort_curve", 11),
        ("dataset_mix_allocation", 6),
        ("forecast_mase_daily", 5),
        ("multimodal_phash_buckets", 3),
        ("join_asof_tolerance_click", 3),
        ("scd2_apply_changes", 8),
        ("bom_subtree_rollup", 12),
    ]:
        df = get(name).spark_fn(spark, sf_correctness)
        assert not plans.has_operator(df, "CartesianProduct"), name
        assert plans.partitionless_window_count(df) == 0, name
        plan = plans.final_plan(df)
        n_ex = plans.count_nodes(plan, "Exchange")
        assert n_ex <= max_exchanges, f"{name}: {n_ex} exchanges"


def test_naive_bayes_serve_is_map_side_fold(spark, sf_correctness):
    """The NB serve's scale claim, r16 edition: the model reaches the
    documents as LITERAL weight maps folded per row (zero joins of any
    kind in the plan — the model never rides a shuffle OR a broadcast
    build), and the only Exchange is the classes²-bounded confusion
    rollup's.  (Until r16 the serve broadcast-joined the V×C weight
    table and re-aggregated at (doc, class) grain; the fold removed
    the document-grain shuffle entirely — OPTIMIZATION_r16.md item 5.)"""
    df = get("naive_bayes_lang_confusion").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert not plans.has_operator(df, "CartesianProduct")
    n_ex = plans.count_nodes(plans.final_plan(df), "Exchange")
    assert n_ex <= 1, f"{n_ex} exchanges — serve must shuffle only the rollup"


def test_dbscan_grid_join_no_cartesian(spark, sf_correctness):
    """The eps-neighborhood must be an EQUI-join on grid-cell keys —
    an accidental cartesian here is the O(n²) self-join the grid
    blocking exists to avoid."""
    df = get("dbscan_embedding_clusters").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "CartesianProduct")
    assert not plans.has_operator(df, "BroadcastNestedLoopJoin")


def test_conformal_no_partitionless_window_and_no_cartesian(spark, sf_correctness):
    """The conformal quantile must come from the bounded histogram +
    triangular join — never a global sort or a partition-less window;
    the qv/kk 1-row sides ride broadcasts (not cartesians over data)."""
    df = get("conformal_priority_coverage").spark_fn(spark, sf_correctness)
    assert plans.partitionless_window_count(df) == 0
    assert not plans.has_operator(df, "CartesianProduct")

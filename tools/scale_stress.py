#!/usr/bin/env python
"""Scale-stress harness (VERDICT r5 next-step #6): driver fixtures stop
at sf0.1, so derive ~10× documents AND events tables into /tmp (never
touching /root/testdata) and measure the scale-sensitive pipelines in
QUERIES below at both scales, printing a JSON scaling table for
BASELINE.md.

Corpus derivation — deterministic replication + perturbation: each of
10 replicas suffixes EVERY token with a replica-unique letter pair
("...qa", "...qb", …). Tokens stay letter-runs (the wc.go tokenizer
contract), every replica keeps the original's internal similarity
structure, and replicas share NO shingles with each other — so the
near-dup graph is 10 disjoint isomorphic copies and the honest
expectation is ~linear wall-time growth (pure replication would
instead grow every dup cluster 10× and the PAIR count ~100×, which
tests the data generator, not the engine).

Plan-shape check: the Exchange count of each query's final plan must
not change between scales (the pins in tests/test_plans.py hold at
10×) — a shape drift at scale would flag an optimizer cliff.

Run: python tools/scale_stress.py   (≈8 min at the default reps)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import registry
from tda596_lab02mapreduce_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/tda596-scale10x")
OUT_GRAPH = os.environ.get("SPARK_GRAFT_SCALE_GRAPH_DIR", OUT + "-graph")
OUT_SKEW = os.environ.get("SPARK_GRAFT_SCALE_SKEW_DIR", OUT + "-skew")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
REPS = int(os.environ.get("SCALE_REPS", "2"))

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "triangle_count_neardup",
    "union_find_components",
    "dedup_cluster_star",
    "graph_reach_recursive",
    # events-side (time-series family): replicas get disjoint user_id
    # ranges, so sessions/windows/as-of matches stay within-replica and
    # the workload is 10 disjoint isomorphic copies — same honest-linear
    # construction as the documents corpus.
    "sessionize_events",
    "join_asof_purchase_click",
    "window_time_range_1h",
    "cdc_latest_per_user",
    # training-prep band (documents-side). bm25_topk_retrieval is
    # deliberately absent: its literal probe terms cannot match the
    # suffix-perturbed 10× tokens, so the final join would degenerate
    # to 0 candidates and the timing would flatter the engine.
    "seq_pack_concat_chunks",
    "vocab_encode_topk",
    "sample_stratified_exact",
    "lm_bigram_score",
    "bpe_top_merges",
    # round-6 analytics band. contrastive_negative_pairs is deliberately
    # absent: its dense-[0,N) draw contract doesn't hold on the
    # replica-offset doc_id layout, so 90% of draws would dangle and the
    # timing would measure a degenerate join.
    "collocation_lift_bigrams",
    "session_path_trigrams",
    "ewma_dyadic_user_value",
    "spearman_value_vs_hour",
    "anomaly_mad_events",
    # round-7 drift/power-law band. Orders-side members (pareto, gini)
    # and the TPC-H band are absent by construction: the harness scales
    # only documents+events. The events replicas keep the original time
    # axis, so the PSI/KS halves and the ACF day series stay aligned
    # and simply see 10× the rows per bin/value/day.
    "markov_event_transitions",
    "token_entropy_by_source",
    "zipf_token_fit",
    "psi_value_drift",
    "ks_value_drift",
    "mutual_information_type_hour",
    "acf_daily_events",
    # round-8: the remaining rewired former single-partition-window
    # queries (VERDICT r7 task 1 'done' = they join this table).
    # pareto/gini ride the 10× orders staging added in r7; the
    # equi-depth histogram rides 10× lineitem; quantile-PSI rides
    # 10× events.
    "histogram_equidepth_price",
    "gini_revenue_concentration",
    "pareto_revenue_concentration",
    "psi_value_drift_qbins",
    # fact-table band (10× orders+lineitem, unchanged dimensions):
    # the shuffle joins and fact aggregates that carry the 100 TB
    # story. q9 is the broadcast-only contrast (no fact-fact join).
    "pricing_summary",
    "join_sortmerge_revenue",
    "tpch_q7_nation_trade_volume",
    "tpch_q9_profit_by_nation_year",
    "tpch_q10_returned_revenue",
    "tpch_q12_priority_by_linestatus",
    "tpch_q20_half_quantity_suppliers",
    "tpch_q21_sole_supplier_lines",
    # round-8: similarity/embedding band (VERDICT r7 task 5). 10×
    # embeddings via per-(replica, dim) deterministic sign flips:
    # cross-replica cosine is ~0 (half the dims negate), so top-k
    # neighbor structure stays within-replica and the honest
    # expectation is linear growth. The vec_id<10 query set stays
    # fixed — the ANN serving contract: same queries, 10× corpus.
    "similarity_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "knn_label_classify",
    "similarity_mmr_rerank",
    "embedding_centroid_outliers",
    "vector_dim_stats",
    "embedding_quantize_int8",
    # round-8 widening: model-eval / divergence / set-similarity /
    # scaling band. roc_auc and feature_scale ride 10× orders/events
    # (score and value grains grow ~linearly); kl/ppjoin/cluster_report
    # ride the documents replicas (disjoint shingle spaces keep the
    # pair structure within-replica); ks_binned's bin grain is scale-
    # INVARIANT by construction (the whole point) — expect ~flat time
    # driven by the scan; pq rides the sign-flipped embeddings.
    # join_sorted_neighborhood_pairs is deliberately absent: it reads
    # the customer dimension, which this harness does NOT scale — a
    # row here would time identical inputs at both scales.
    "ks_value_drift_binned",
    "roc_auc_priority_price",
    "calibration_reliability_bins",
    "feature_scale_normalize",
    "kl_divergence_lang_tokens",
    "dedup_ppjoin_pairs",
    "dedup_cluster_report",
    "similarity_pq_topk",
    # round-8 second wave: sweep-line / split-scan / decomposition /
    # novelty band. concurrency and the two threshold scans ride 10×
    # events (boundary and cent grains grow ~linearly); seasonal's day
    # grain is calendar-bounded so its time is the 10× scan + day
    # rollup; substring spans and novelty ride the disjoint-shingle
    # documents replicas; multi-OLS rides 10× lineitem (9-number
    # shuffle regardless of scale — expect scan-dominated flat-ish).
    "concurrency_peak_daily",
    "decision_split_gain",
    "pr_curve_thresholds",
    "seasonal_decompose_daily",
    "dedup_substring_spans",
    "text_ngram_novelty",
    "regr_multi_ols",
    # cogroup/interval/bootstrap band (all events-side; the interval
    # join's within-replica user ranges keep cross-replica session
    # overlaps possible — replicas share the time axis by design).
    "udf_cogroup_asof",
    "join_interval_overlap",
    "bootstrap_mean_ci",
    # value-grain transform band (events-side)
    "quantile_transform_value",
    "timeseries_interpolate_linear",
    # round-9 band. hits_copurchase_bipartite / kcore_peel_bipartite /
    # recsys_item_cosine_topk are deliberately absent HERE: the staging
    # replicates FACTS against UNCHANGED customer/part dimensions, so
    # their distinct (cust, part) edge sets densify instead of growing
    # linearly (recsys basket pair emission is O(b²) in the densified
    # basket) — the honest-linear ratio interpretation doesn't hold.
    # They are measured instead by the SCALE_BAND=graph mode (round-10,
    # VERDICT r9 #1), whose staging offsets custkey AND partkey per
    # replica so the co-purchase graph is N disjoint isomorphic copies.
    # The six below scale linearly by construction (disjoint events
    # users / suffixed documents tokens / linear order facts).
    "survival_km_signup_purchase",
    "join_asof_nearest_click",
    "feature_hash_tokens_256",
    "assoc_rules_confidence",
    "audience_overlap_matrix",
    "hampel_outliers_daily",
    # round-10 band. All honest-linear on this staging: events queries
    # stay within disjoint user/day replicas, the facts queries grow
    # baskets BY ORDER (order keys replica-offset, basket sizes
    # unchanged) against the fixed dimensions, documents queries ride
    # the disjoint-suffix corpus, and pca rides the sign-flipped
    # embeddings (the FIT is part of the measured op — dataset_key is
    # the staging dir, so the probe pays one real fit + serve, the
    # deploy shape). text_stopword_discovery is deliberately ABSENT:
    # replica suffixes push every token's per-source doc-frequency
    # under the 60% threshold, so the 10× result is empty — a
    # degenerate measurement, not an honest one.
    # ppr_seeded_related_parts is in GRAPH_QUERIES (densifying here).
    "split_temporal_holdout",
    "eb_shrunk_return_rate",
    "shard_bin_packing",
    "multimodal_phash_buckets",
    "frequent_triples_brand",
    "ab_test_mannwhitney_u",
    "theilsen_daily_trend",
    "forecast_mase_daily",
    "ltv_cohort_curve",
    "scd2_apply_changes",
    "join_asof_tolerance_click",
    "embedding_pca_project",
    # round-10 late wave (same honest-linear arguments as above —
    # all events/orders-fact queries within disjoint user replicas or
    # order-grain baskets). bom_subtree_rollup is deliberately ABSENT:
    # it reads ONLY the unscaled part dimension, so a staging ratio
    # would measure nothing. stream_interval_join_fouter is included
    # as the one STREAMING scale datapoint — its measure is the full
    # AvailableNow drain plus the keyed reconstruction.
    "cdc_tombstone_compaction",
    "pattern_vshape_user_value",
    "interval_coalesce_user_spans",
    "perceptron_batch_priority",
    "stream_interval_join_fouter",
    # round-11 wave. All honest-linear on this staging: the GLM pair
    # and quantile-normalize ride 10× orders/events facts; CUPED/DiD
    # and the CEP run pattern ride disjoint-user events replicas;
    # kmeans rides the sign-flipped embeddings (fit+serve measured,
    # dataset_key = staging dir — the pca/ivf probe shape); top-p and
    # the chunk manifest ride the suffixed documents (vocabulary and
    # byte volume both grow ~linearly; the per-source top-p set
    # becomes the replica-interleaved union — same prefix mass).
    # join_jaro_winkler_pairs is deliberately ABSENT: it reads only
    # the UNSCALED customer dimension (the join_sorted_neighborhood
    # rule — a row here would time identical inputs at both scales).
    "logistic_gd_priority",
    "roc_auc_logistic_score",
    "embedding_kmeans_assign",
    "pattern_decline_recovery_runs",
    "feature_quantile_normalize",
    "ab_cuped_adjusted_means",
    "ab_diff_in_diff",
    "vocab_top_p_cut",
    "blob_chunk_manifest",
    "xcorr_click_purchase_leadlag",
    # round-12 wave. naive_bayes rides the suffixed documents (token
    # stream grows linearly; the staged vocabulary is 10× — 310 tokens
    # — which the r13 top-V cap now reduces to exactly V=24 collected
    # rows, so the 10× run exercises the cap biting 13× harder than
    # the fixture while driver traffic stays V + V×C by construction;
    # fit+serve measured, dataset_key = staging dir). conformal rides 10× orders
    # (score grain linear; the quantile histogram stays domain-bounded
    # — the operator's whole scale claim). bpe_encode_token_stats
    # rides the suffixed corpus (train+encode measured; the merge
    # table stays 3 rows). dbscan_embedding_clusters is deliberately
    # ABSENT here: the sign-flip embedding staging OVERLAYS replicas
    # in the dims-(0,1) plane (4 sign patterns across 10 replicas ⇒
    # ~2.5× planar density ⇒ superlinear pair fan-out) — it gets its
    # own translated staging, SCALE_BAND=dbscan.
    "naive_bayes_lang_confusion",
    "conformal_priority_coverage",
    "bpe_encode_token_stats",
    # round-13 wave. The ALS pair rides 10× order facts with customers
    # UNCHANGED: the (customer × brand) rating grid is key-bounded, so
    # 10× lineitems densify r(u,i) while the matrix stays the same
    # shape — the ratings-build scan is the only linear term and the
    # four Cramer solves are key-bounded, exactly the operator's
    # 100 TB posture. Mondrian conformal rides 10× orders (per-class
    # histograms stay domain-bounded — the same claim as its marginal
    # twin, now × classes). The set-algebra sketch rides 10× events
    # within disjoint user replicas (k=1024 samples per type are
    # SIZE-FIXED: sketch build cost grows with the scan, the algebra
    # itself is constant — the whole point of the sketch).
    "recsys_als_rank2",
    "recsys_als_topk",
    "conformal_mondrian_by_class",
    "audience_setalgebra_sketch",
    # round-14 wave. The CART rides 10× orders: both feature domains
    # are bucket-bounded (≤ 24 feature-value rows per node scan), so
    # the melt/count scans grow linearly while the cumsum state and
    # the 3 collected best-split rows stay O(1) — the operator's whole
    # scale claim. The ALS held-out eval shares the rank-2 posture
    # (key-bounded grid; the fold filter is map-side) plus two
    # join+1-row-aggregate error sums. The streaming NB serve rides
    # the suffixed documents as a full AvailableNow drain (the
    # stream_interval_join_fouter precedent): scoring is stateless
    # per-row folds, so the honest expectation is scan-linear with
    # ZERO state at both scales (fit once per staging via the sidecar
    # cache — the serve-only contract; the batch twin times the fit).
    "tree_depth2_priority",
    "recsys_als_heldout_sse",
    "stream_nb_classify",
    # same posture as the tree fit plus a broadcast 4-row leaf join
    # on the routed test fold
    "tree_depth2_heldout_confusion",
    # round-15 wave. Both ride 10× orders with the CART posture
    # (bucket-bounded feature domains ⇒ O(1) cumsum state + O(rounds
    # or 2^depth) collected rows while the melt scans grow linearly):
    # the boosted stumps add two in-plan 1-row-broadcast reweights,
    # the depth-3 tree runs 7 sequential split scans over
    # geometrically shrinking nodes. stream_nb_model_swap is
    # deliberately ABSENT: its copies=2 / maxFilesPerTrigger=1
    # staging is SEMANTIC (2 full-table micro-batches around the
    # version bump); the 32-part staged documents dir would turn the
    # drain into a 64-batch run of a different query — its scale
    # posture is stream_nb_classify's stateless serve plus an
    # O(V×C)-row per-batch model re-read, both already measured.
    "tree_boosted_stumps",
    "tree_depth3_priority",
    # the ensemble's held-out twin: train-fold boosting + a map-side
    # vote-sum projection over the test fold (the r14
    # tree_depth2_heldout_confusion precedent)
    "tree_boosted_heldout_confusion",
]

# SCALE_BAND=graph (round-10, VERDICT r9 #1): the bipartite iterative
# band, measured against a staging whose replicas are DISJOINT graphs
# (o_orderkey, o_custkey, AND l_partkey all replica-offset — the same
# honest-linear construction as the documents/events/facts stagings:
# N isomorphic copies, so per-round join+agg work grows ~linearly and
# the fixed round count amortizes its per-job overhead). All four
# queries read ONLY orders(o_orderkey,o_custkey) +
# lineitem(l_orderkey,l_partkey), so the unscaled dims are irrelevant.
# assoc_rules_confidence is absent here (it joins part for brands and
# already rides the linear facts staging above).
GRAPH_QUERIES = [
    "hits_copurchase_bipartite",
    "kcore_peel_bipartite",
    "community_label_propagation",
    "recsys_item_cosine_topk",
    "ppr_seeded_related_parts",
    # round-12: the two min-plus members (unit-weight BFS, weighted
    # Bellman-Ford). Same edge source as PPR — disjoint isomorphic
    # copies; the 5 global seeds all land in ONE replica (identical
    # degree profiles, id tiebreak picks the lowest-offset copy), so
    # the reached set stays ~constant while each round's frontier ⋈
    # edges join scans the full 10× edge list — the honest expectation
    # is edge-scan-dominated ~linear growth with constant output.
    "graph_bfs_hops",
    "graph_weighted_cheapest",
]

# SCALE_BAND=stream (round-11, VERDICT r10 #1): the stateful streaming
# band — the one operator family whose 100 TB posture was argued but
# never measured. Each query below performs a REAL AvailableNow drain
# (memory sink or foreachBatch) inside its function; the probe times
# the full drain + batch tail and reads the engine's own
# StreamingQueryProgress (streaming/windows.py:DRAIN_STATS) for
# micro-batch count, input rows, and state-store rows/bytes. The 10×
# staging is TIME-RANGE partitioned with ascending file mtimes and
# drained under SPARK_GRAFT_STREAM_MAX_FILES=2 (16 parts → 8 batches),
# so watermarks advance monotonically between micro-batches and
# eviction actually happens — the tailing-ingest shape, not one giant
# batch. State-size expectations by operator class: O(users) for the
# applyInPandasWithState trio and dedup (watermark-bounded), O(open
# windows × keys) for the watermarked window aggs, O(bins)/O(cells)
# flat for PSI and CMS (no keyed state store at all for CMS).
STREAM_QUERIES = [
    "stream_dedup_ids",
    "stream_running_user_stats",
    "stream_ewma_user",
    "stream_floor_balance_user",
    "stream_window_topk",
    "stream_ohlc_hourly",
    "stream_ohlc_hourly_append",  # r12: eviction twin — state must stay
    # O(users × OPEN hours) while complete mode grows linearly
    "stream_user_spans_ttl",  # r12: EventTimeTimeout expiry — state
    # must track the TTL+delay horizon, not the key universe
    "stream_psi_monitor",
    "stream_cms_merge_users",
]

# registered query name → memory-sink/foreachBatch drain names whose
# DRAIN_STATS entries belong to it
STREAM_DRAINS = {
    "stream_dedup_ids": ["q_stream_dedup_ids"],
    "stream_running_user_stats": ["q_stream_running_user_stats"],
    "stream_ewma_user": ["q_stream_ewma_user"],
    "stream_floor_balance_user": ["q_stream_floor_balance"],
    "stream_window_topk": ["q_stream_window_topk"],
    "stream_ohlc_hourly": ["q_stream_ohlc_hourly"],
    "stream_ohlc_hourly_append": ["q_stream_ohlc_hourly_append"],
    "stream_user_spans_ttl": ["q_stream_user_spans_ttl"],
    "stream_psi_monitor": ["psi_monitor_counts"],
    "stream_cms_merge_users": ["q_stream_cms_merge_users"],
}

OUT_STREAM = os.environ.get("SPARK_GRAFT_SCALE_STREAM_DIR", OUT + "-stream")

# SCALE_BAND=stopword (round-11, VERDICT r10 #6): text_stopword_discovery
# is deliberately ABSENT from the main linear band because that
# staging's replica token suffixes push every per-source document
# frequency under the 60% threshold — an empty result, a degenerate
# measurement. The honest staging for DF-share operators replicates
# DOCUMENTS (replica-offset doc_ids) with token text UNCHANGED within
# each source: per-source document frequencies are then scale-invariant
# by construction (df and n_docs both scale by REPLICAS, the ppm share
# is identical), so the 10× run computes the same non-empty stopword
# list over 10× the rows.
STOPWORD_QUERIES = ["text_stopword_discovery"]

OUT_STOPWORD = os.environ.get("SPARK_GRAFT_SCALE_STOPWORD_DIR", OUT + "-stopword")


# SCALE_BAND=dbscan (round-12): dbscan_embedding_clusters is
# deliberately ABSENT from the main linear band because the sign-flip
# embedding staging OVERLAYS replicas in the dims-(0,1) plane (only 4
# sign patterns exist for 2 dims, so 10 replicas stack ~2.5 deep —
# planar density ×2.5 and the grid join's pair fan-out superlinear:
# that measures the staging, not the operator). The honest staging for
# a PLANAR operator translates dims 0 and 1 into a disjoint grid of
# replica tiles — and (r13, closing the r12 float32-ulp caveat) the
# translation happens in the OPERATOR'S OWN QUANTIZED INTEGER DOMAIN:
# each staged coordinate is built as (floor(x·2^20) + tile·STEP_Q +
# 0.25)·2^-20, where STEP_Q = 75·EPS_Q (≈1.5 units — beyond the ±0.5
# spread + eps, AND an exact cell multiple so per-replica cell-
# relative geometry is identical). The +0.25-grain nudge makes the
# float32 cast round-trip EXACTLY for every |coord| < 16 (ulp ≤ the
# 2^-20 grain there, and the nudged value is never at a rounding
# tie that could cross a cell boundary), and the 10-wide tile grid
# keeps all coords ≤ ~14 up to 100 replicas. Within-replica quantized
# geometry is therefore preserved BIT-EXACTLY at any replica count —
# role counts must be exactly ×REPLICAS, no ulp tolerance needed.
# Expected: linear candidate pairs, stable plan shape, N× grid cells.
DBSCAN_QUERIES = ["dbscan_embedding_clusters"]

OUT_DBSCAN = os.environ.get("SPARK_GRAFT_SCALE_DBSCAN_DIR", OUT + "-dbscan")


def stage_dbscan(spark) -> None:
    from tda596_lab02mapreduce_spark.operators.dbscan import EPS_Q, Q_SCALE

    # The float32 bit-exactness argument (|coord| < 16 round-trips the
    # +0.25-grain nudge exactly) only holds while the 10-wide tile grid
    # keeps every offset coordinate ≤ ~14 — true up to 100 replicas.
    # Beyond that the offsets cross 16, ulp > grain, and the EXACT
    # ×REPLICAS role-count assertion is silently voided — so enforce
    # the precondition instead of commenting it (ADVICE r13).
    if REPLICAS > 100:
        raise ValueError(
            f"stage_dbscan: REPLICAS={REPLICAS} > 100 breaks the "
            "float32 |coord|<16 exactness precondition (tile offsets "
            "would exceed the exact-round-trip range); widen the tile "
            "grid before raising the replica count"
        )
    step_q = 75 * EPS_Q  # ≈1.5 units, an exact eps-cell multiple
    # integer-domain translation (see band comment): quantize with the
    # operator's own floor(x·2^20), add the tile offset as an exact
    # integer, re-emit the cell's +0.25-grain point — float32 exact
    # for |coord| < 16, so the operator recovers the translated
    # integer bit-for-bit and within-replica geometry is preserved
    # exactly at any replica count.
    tx = f"(replica % 10) * {step_q}"
    ty = f"(replica div 10) * {step_q}"
    expr = (
        "transform(embedding, (x, i) -> CAST(CASE "
        f"WHEN i = 0 THEN (floor(CAST(x AS DOUBLE) * {Q_SCALE}) + {tx} + 0.25) / {Q_SCALE} "
        f"WHEN i = 1 THEN (floor(CAST(x AS DOUBLE) * {Q_SCALE}) + {ty} + 0.25) / {Q_SCALE} "
        "ELSE x END AS FLOAT))"
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    out = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "vec_id"
        ),
        F.expr(expr).alias("embedding"),
        "label",
    )
    shutil.rmtree(OUT_DBSCAN, ignore_errors=True)
    out.repartition(32).write.parquet(f"{OUT_DBSCAN}/embeddings.parquet")


# ANN-recall band (r14 verdict #3): the one axis the wall/shape bands
# don't measure — retrieval QUALITY at staged scale. Wall and plan
# shape are measured like every band; beside them, recall@5 of the
# REGISTERED serving queries against exact truth computed ON THE
# STAGED CORPUS (cosine truth for IVF, L2 truth for PQ — each query's
# own fixture-floor metric from tests/test_dedup.py, floors 0.4 and
# 0.85). The sign-flip staging is an exact isometry within a replica
# (a fixed ±1 dim pattern preserves inner products), so replica-0
# queries keep their base neighbor geometry while 10× the corpus
# competes for their top-5 — the honest hard case for recall. The
# driver-side numpy truth is a PROBE-ONLY collect (tool, not
# operator). The same floors run against the staging via
# SPARK_GRAFT_ANN_DIR in tests/test_dedup.py.
ANN_QUERIES = ["similarity_ivf_topk", "similarity_pq_topk"]

# REPLICA-DEPENDENT path: the IVF/PQ model sidecars are keyed by
# realpath(corpus dir), so a fixed path re-staged at a different
# REPLICAS would silently serve the PREVIOUS staging's codebooks
# against the new corpus (r15 review — the first 100× reading did
# exactly that and was re-measured)
OUT_ANN = os.environ.get(
    "SPARK_GRAFT_SCALE_ANN_DIR", f"{OUT}-ann-x{REPLICAS}"
)


def stage_ann(spark) -> None:
    """Embeddings-only staging — the stage() sign-flip construction
    (replica-offset vec_ids, md5-parity per-(replica, dim) sign
    flips) written standalone so the recall band doesn't pay the full
    multi-table staging."""
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    flip = lambda x, i: (  # noqa: E731
        x
        * F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("replica").cast("string"),
                            i.cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .cast("float")
    ).cast("float")
    out = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "vec_id"
        ),
        F.transform("embedding", flip).alias("embedding"),
        "label",
    )
    shutil.rmtree(OUT_ANN, ignore_errors=True)
    out.repartition(32).write.parquet(f"{OUT_ANN}/embeddings.parquet")


def ann_recall(spark, sf_dir: str) -> dict[str, float]:
    """recall@5 of the registered IVF and PQ serving queries vs exact
    truth on the SAME corpus (cosine for IVF, L2 for PQ, self
    excluded — the tests/test_dedup.py floor metrics)."""
    import numpy as np  # noqa: PLC0415

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    ids = np.array([r[0] for r in rows])
    x = np.array([list(r[1]) for r in rows])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    truth_cos: set[tuple[int, int]] = set()
    truth_l2: set[tuple[int, int]] = set()
    for q in sorted(int(i) for i in ids[ids < 10]):
        qv = x[ids == q][0]
        cos = xn @ (qv / np.linalg.norm(qv))
        cos[ids == q] = -np.inf
        truth_cos |= {
            (q, int(ids[i])) for i in np.lexsort((ids, -cos))[:5]
        }
        d2 = ((x - qv) ** 2).sum(1)
        d2[ids == q] = np.inf
        truth_l2 |= {(q, int(ids[i])) for i in np.lexsort((ids, d2))[:5]}

    qs = registry.all_queries()
    out = {}
    for name, truth in (
        ("similarity_ivf_topk", truth_cos),
        ("similarity_pq_topk", truth_l2),
    ):
        got = {
            (int(r["query_id"]), int(r["neighbor_id"]))
            for r in qs[name](spark, sf_dir).collect()
        }
        out[name] = round(len(got & truth) / len(truth), 3)
    return out


# Closure band (r14 verdict #2): the loop shape where the CLOSURE
# GROWS each round — pointer doubling (bom_subtree_rollup, O(log
# depth) self-joins over an expanding pair set) and the native
# recursive CTE (recursive_cte_bom_depth, UnionLoop per-level walk).
# Staging: a DIV-10 tree replica per copy at CONSTANT extra depth —
# staged key = (100 + replica) · 10^digits(pk) + pk, the digit-PREFIX
# map, which COMMUTES with DIV 10 (digits(pk DIV 10) = digits(pk) − 1
# for pk ≥ 10), so every base edge maps to a staged edge and each
# replica is an exact tree ISOMORPH of the base forest — crucially
# the base key range is DENSE, so every internal tree node exists as
# a part row in the staging exactly as it does in the base (a
# fixed-width shift instead breaks this: internal nodes vanish and
# the doubling finds 2-entry chains — caught by the closed form
# below on first run). Prefixes 100..100+N−1 are all 3-digit for
# N ≤ 900; chains converge above each replica's prefix node
# (100+r → 10+x → 1, ≤ 11 shared virtual apex nodes — the DIV-10
# tree is ONE tree over the integers, so apex sharing is inherent
# and disclosed rather than hidden). Integrity closed form: the
# doubling composes only THROUGH nodes that exist as rows, so each
# staged chain runs self → … → its replica's 3-digit prefix (the
# prefix is reachable as a terminal anc, the virtual apex above it
# is not): exactly digits(pk)+1 entries per node, one more than the
# base's digits(pk) (base roots are 1-digit with no parent edge).
# Σ subtree_parts MUST equal REPLICAS · (pairs_base + N_base)
# exactly — the staging/overlay detector (a fixed-width-shift
# staging read 2-entry chains here on first run and was caught).
# Total pairs grow ~1.2×REPLICAS, reported as the exact pairs ratio
# beside wall — the closure's own growth axis.
CLOSURE_QUERIES = ["bom_subtree_rollup", "recursive_cte_bom_depth"]

OUT_CLOSURE = os.environ.get("SPARK_GRAFT_SCALE_CLOSURE_DIR", OUT + "-closure")


def stage_closure(spark) -> None:
    from tda596_lab02mapreduce_spark import io as _io  # noqa: PLC0415

    if REPLICAS > 900:
        raise ValueError(
            f"stage_closure: REPLICAS={REPLICAS} > 900 breaks the "
            "fixed-width 3-digit prefix (constant-depth) construction; "
            "widen the prefix before raising the replica count"
        )
    part = _io.load(spark, SRC, "part").select("p_partkey", "p_retailprice")
    reps = spark.range(REPLICAS).select(F.col("id").cast("long").alias("replica"))
    staged = part.crossJoin(F.broadcast(reps)).select(
        F.expr(
            "CAST(replica + 100 AS BIGINT)"
            " * CAST(power(10, length(CAST(p_partkey AS STRING))) AS BIGINT)"
            " + p_partkey"
        ).alias("p_partkey"),
        "p_retailprice",
    )
    shutil.rmtree(OUT_CLOSURE, ignore_errors=True)
    staged.repartition(32).write.parquet(f"{OUT_CLOSURE}/part.parquet")


def stage_stopword(spark) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    out = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "doc_id"
        ),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    shutil.rmtree(OUT_STOPWORD, ignore_errors=True)
    out.repartition(32).write.parquet(f"{OUT_STOPWORD}/documents.parquet")


# SCALE_BAND=skew (round-10, VERDICT r9 #6): the user-keyed band under
# pathological key skew — ONE user carries ~25% of all rows (hot-row
# selection by md5 parity of the event id, so the hot rows are spread
# uniformly over time and input splits: the shuffle TARGET is skewed,
# not the scan). Control and treatment stagings have IDENTICAL row
# counts and time axes; only the user_id layout differs. Every query
# below reads ONLY the events table. Measured twice on the skewed
# staging: with AQE skew handling as shipped, and with
# spark.sql.adaptive.{skewJoin,optimizeSkewsInRebalancePartitions}
# disabled — joins can be AQE-split, but window/groupBy state for one
# key CANNOT (a single partitionBy key is inherently serial), which is
# exactly what the table should show.
SKEW_QUERIES = [
    "sessionize_events",
    "cdc_latest_per_user",
    "window_time_range_1h",
    "ewma_dyadic_user_value",
    "inventory_floor_balance",
    "max_drawdown_user",
    "user_activity_streaks",
    "join_asof_purchase_click",
    "udf_cogroup_asof",
]


# Fact-fact joins legitimately CROSS the broadcast threshold between
# the fixture and the 10× corpus: at sf0.1 AQE converts
# lineitem⋈orders to a broadcast join (0 join exchanges), at 10× the
# build side is too big and the intended shuffle join appears with
# its exchanges. That is the designed regime transition, not an
# optimizer cliff — the 10× plan IS the cluster plan. Queries listed
# here report shape_stable=True when their exchange count GROWS at
# 10× (a shrink would still flag).
BROADCAST_TRANSITION_OK = {
    "join_sortmerge_revenue",
    "tpch_q12_priority_by_linestatus",
    "tpch_q21_sole_supplier_lines",
    # the (event_type, value)-grain x-midrank map broadcasts at sf0.1
    # and crosses the threshold at 10× (exchanges 16 → 20, the
    # hashpartitioning(event_type, x) pair appearing) — at 100 TB the
    # distinct-value midrank table is NOT broadcastable, so the
    # shuffle join IS the cluster plan; designed transition.
    "spearman_value_vs_hour",
    # the session-cell table broadcasts at sf0.1 (one side under the
    # 10 MB threshold collapses the cell join, pair-distinct, and pair
    # rollup into broadcast partials); at 10× the cell equi-join goes
    # shuffle (hashpartitioning(cell) + the pair-key exchanges
    # appearing, 3 → 10) — at 100 TB sessions are never broadcastable,
    # so the hash-partitioned bin join IS the cluster plan.
    "join_interval_overlap",
    # these two keep the broadcast through 10× and cross the threshold
    # at 20× (SCALE_REPLICAS=20): exchanges 2 → 6 with the
    # l_orderkey/o_orderkey join keys appearing — the same designed
    # regime change, observed one doubling later
    "tpch_q7_nation_trade_volume",
    "tpch_q10_returned_revenue",
    # keeps its broadcasts through 20× and crosses at 50×
    # (SCALE_REPLICAS=50, r9): the candidate-pair verification joins
    # outgrow the 10 MB threshold and exchanges go 6 → 21 with the
    # id_a/id_b pair keys appearing — at 100 TB candidate pairs are
    # never broadcastable, so the pair-keyed hash join IS the cluster
    # plan (same designed regime change as join_interval_overlap,
    # observed two doublings later).
    "dedup_ppjoin_pairs",
    # crosses at 20× (r10): the 435-row slope table's PLAN-TIME size
    # estimate is input-proportional (Catalyst can't know the day
    # grain is 30 groups), so the small_df_rank triangular join plans
    # as a shuffle (exchanges 11 → 13, hashpartitioning(num,den,s,
    # da,db) appearing). The side is bounded by days² — horizon-
    # proportional, NOT forever-broadcastable (a 10-year horizon is
    # 6.6M pairs), so per the round-10 de-hinting discipline the
    # regime transition is left to the optimizer rather than forced.
    "theilsen_daily_trend",
    # crosses at 10× (r10): the post-drain reconstruction's orphan
    # anti-joins (safe clicks/purchases vs kept pairs) outgrow the
    # broadcast threshold and the keyed exchanges appear. Matched
    # pairs at 100 TB are never broadcastable, so the keyed anti-join
    # IS the cluster plan (the dedup_ppjoin_pairs regime change,
    # streaming edition). r11 re-measure after the asymmetric-cut fix
    # added the purchase-side anti-join: 12 → 10 exchanges with
    # IDENTICAL key sets (AQE broadcast-converts two at 10×) — key-set
    # stability is what the guard checks.
    "stream_interval_join_fouter",
    # crosses at 100× (r15 closure band): the 88k-pair base closure
    # broadcasts through every doubling round and the final part
    # join; the 10.9M-pair 100× closure crosses the threshold and the
    # anc/node composition joins + p_partkey rollup join go shuffle
    # (exchanges 2 → 6, hashpartitioning(node)/(p_partkey) appearing).
    # At 100 TB a transitive closure is never broadcastable, so the
    # keyed hash join IS the cluster plan — same designed regime
    # change as dedup_ppjoin_pairs, closure edition.
    "bom_subtree_rollup",
    # crosses at 100× (r15 ANN band): the refine stage's exact-vector
    # join-back broadcasts the corpus side at fixture scale; the 200k-
    # vector staging crosses the threshold and the neighbor_id-keyed
    # hash join appears (exchanges 2 → 8, query_id re-shuffles for the
    # shuffled top-k windows alongside). Corpus vectors at 100 TB are
    # never broadcastable, so the keyed join IS the cluster plan.
    "similarity_pq_topk",
}


def stage(spark) -> None:
    # replica-unique letter suffix keeps replica token spaces DISJOINT
    # (the honest-linear construction): one letter for ≤ 20 replicas
    # (unchanged, so prior 10×/20× stagings stay byte-identical), two
    # letters up to 400 (r9's 50× probe) — beyond that, refuse rather
    # than silently share tokens.
    if REPLICAS > 400:
        raise ValueError("SCALE_REPLICAS must be ≤ 400 (two suffix letters)")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    letters = F.lit("abcdefghijklmnopqrst")
    if REPLICAS <= 20:
        suffix = F.substring(letters, F.col("replica") + 1, 1)
    else:
        suffix = F.concat(
            F.substring(letters, (F.col("replica") / 20).cast("int") + 1, 1),
            F.substring(letters, F.col("replica") % 20 + 1, 1),
        )
    text2 = F.concat_ws(
        " ",
        F.transform(
            F.split("text", " ", -1), lambda t: F.concat(t, F.lit("q"), suffix)
        ),
    )
    out = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("replica").cast("long") * 10_000_000).alias(
                "doc_id"
            ),
            text2.alias("text"),
            "lang",
            "source",
            F.length(text2).alias("n_chars"),
        )
    )
    shutil.rmtree(OUT, ignore_errors=True)
    # ~32 output files so the 10× scan is many-split (the cluster
    # regime) rather than inheriting the fixture's single row group.
    out.repartition(32).write.parquet(f"{OUT}/documents.parquet")

    from tda596_lab02mapreduce_spark import io as _io  # noqa: PLC0415

    ev = _io.load(spark, SRC, "events")
    ev10 = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("replica").cast("long") * 100_000_000).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    ev10.repartition(32).write.parquet(f"{OUT}/events.parquet")

    # Fact-table replicas for the TPC-H / join band: 10× orders and
    # lineitem with replica-offset order keys (joins stay
    # within-replica) but UNCHANGED customer/part/supplier keys —
    # the realistic growth axis: the same dimensions, 10× the facts.
    orders = _io.load(spark, SRC, "orders")
    off_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    orders10 = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("replica").cast("long") * off_o).alias(
            "o_orderkey"
        ),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    orders10.repartition(32).write.parquet(f"{OUT}/orders.parquet")
    li = _io.load(spark, SRC, "lineitem")
    li10 = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("replica").cast("long") * off_o).alias(
            "l_orderkey"
        ),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    li10.repartition(32).write.parquet(f"{OUT}/lineitem.parquet")

    # 10× embeddings: replica-offset ids + per-(replica, dim) sign
    # flips (md5 parity — deterministic, engine-free). Two replicas
    # disagree on ~half of the 64 dims, so cross-replica cosine ~0 and
    # every similarity query's neighbor structure stays within-replica
    # — the same honest-linear construction as the token-suffix corpus.
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    flip = lambda x, i: (  # noqa: E731
        x
        * F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(":", F.col("replica").cast("string"), i.cast("string"))
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .cast("float")
    ).cast("float")
    emb10 = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "vec_id"
        ),
        F.transform("embedding", flip).alias("embedding"),
        "label",
    )
    emb10.repartition(32).write.parquet(f"{OUT}/embeddings.parquet")

    # unscaled tables copied so every registered query resolves
    for t in ("region", "nation", "customer", "supplier", "part"):
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


def stage_graph(spark) -> None:
    """Replica-DISJOINT bipartite graph staging: orders+lineitem with
    o_orderkey, o_custkey and l_partkey ALL replica-offset, so the
    customer→part co-purchase graph becomes REPLICAS disjoint
    isomorphic copies — degrees, basket sizes, and core structure all
    stay exactly those of the fixture graph. (The main facts staging
    deliberately keeps dimension keys unchanged, which DENSIFIES this
    graph instead — fine for fact joins, wrong for per-node iterative
    work; this staging is the band's honest growth axis.)"""
    from tda596_lab02mapreduce_spark import io as _io  # noqa: PLC0415

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    orders = _io.load(spark, SRC, "orders").select(
        "o_orderkey", "o_custkey"
    )
    off_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    off_c = orders.agg(F.max("o_custkey")).first()[0] + 1
    og = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("replica").cast("long") * off_o).alias(
            "o_orderkey"
        ),
        (F.col("o_custkey") + F.col("replica").cast("long") * off_c).alias(
            "o_custkey"
        ),
    )
    li = _io.load(spark, SRC, "lineitem").select("l_orderkey", "l_partkey")
    off_p = li.agg(F.max("l_partkey")).first()[0] + 1
    lg = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("replica").cast("long") * off_o).alias(
            "l_orderkey"
        ),
        (F.col("l_partkey") + F.col("replica").cast("long") * off_p).alias(
            "l_partkey"
        ),
    )
    shutil.rmtree(OUT_GRAPH, ignore_errors=True)
    og.repartition(32).write.parquet(f"{OUT_GRAPH}/orders.parquet")
    lg.repartition(32).write.parquet(f"{OUT_GRAPH}/lineitem.parquet")


def stage_stream(spark) -> None:
    """Time-ordered 10× events staging for the streaming band: the
    SAME replica construction as stage() (replica-offset event/user
    ids, shared time axis — disjoint per-user series, 10× the keys)
    but written as 16 TIME-RANGE part files with ascending mtimes, so
    FileStreamSource + maxFilesPerTrigger feeds micro-batches in
    event-time order: watermarks advance monotonically between batches
    and state eviction actually happens, like a real tailing ingest.
    (The main staging's repartition(32) parts each span the WHOLE time
    axis — a multi-batch drain of those would feed wildly out-of-order
    data and measure watermark-drop artifacts, not drain behavior.)"""
    from tda596_lab02mapreduce_spark import io as _io  # noqa: PLC0415

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    ev = _io.load(spark, SRC, "events")
    ev10 = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("replica").cast("long") * 100_000_000).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    shutil.rmtree(OUT_STREAM, ignore_errors=True)
    ev10.repartitionByRange(16, "ts").write.parquet(f"{OUT_STREAM}/events.parquet")
    # range partition 0 holds the lowest ts range and writes
    # part-00000, so alphabetical part order IS time order; pin it for
    # FileStreamSource (which sorts by modification time) with
    # strictly ascending mtimes
    import glob
    import time as _t

    parts = sorted(glob.glob(f"{OUT_STREAM}/events.parquet/part-*.parquet"))
    t0 = _t.time() - 7200
    for i, p in enumerate(parts):
        os.utime(p, (t0 + i * 60, t0 + i * 60))


def measure_stream(spark, sf_dir: str, queries: list[str]) -> dict[str, dict]:
    """Time each streaming query's FULL run (drain + batch tail) and
    capture the engine's per-drain progress metrics."""
    from tda596_lab02mapreduce_spark.streaming import windows as _w

    qs = registry.all_queries()
    res: dict[str, dict] = {}
    for name in queries:
        print(f"[scale] measuring {name} @ {sf_dir}", file=sys.stderr, flush=True)
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm-up
        best, stats = float("inf"), None
        for _ in range(REPS):
            _w.DRAIN_STATS.clear()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
                drains = [
                    _w.DRAIN_STATS[d]
                    for d in STREAM_DRAINS[name]
                    if d in _w.DRAIN_STATS
                ]
                stats = {
                    "n_batches": sum(d["n_batches"] for d in drains),
                    "input_rows": sum(d["input_rows"] for d in drains),
                    "batch_ms": sum(d["batch_ms"] for d in drains),
                    "state_rows_max": max(
                        (d["state_rows_max"] for d in drains), default=0
                    ),
                    "state_rows_last": max(
                        (d["state_rows_last"] for d in drains), default=0
                    ),
                    "state_mem_max_mb": round(
                        max((d["state_mem_max_bytes"] for d in drains), default=0)
                        / 1e6,
                        2,
                    ),
                }
        rows_sec = (
            round(stats["input_rows"] / (stats["batch_ms"] / 1000.0))
            if stats and stats["batch_ms"]
            else None
        )
        res[name] = {"sec": round(best, 3), "rows_per_sec": rows_sec, **(stats or {})}
    return res


def stage_skew(spark) -> None:
    """Two same-size events stagings under ``OUT_SKEW``: ``uniform/``
    (replica-disjoint user ranges — the existing honest-linear layout)
    and ``skewed/`` (identical rows except ~25% of user_ids remapped to
    the single hot user 1, selected by md5 parity of (event_id,
    replica) so hot rows are uniform over time and splits)."""
    from tda596_lab02mapreduce_spark import io as _io  # noqa: PLC0415

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("replica"))
    ev = _io.load(spark, SRC, "events")
    base = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("replica").cast("long") * 100_000_000).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("replica").cast("long") * 10_000_000).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
        F.col("replica"),
    )
    hot = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("event_id").cast("string"),
                        F.col("replica").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 4
        == 0
    )
    shutil.rmtree(OUT_SKEW, ignore_errors=True)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    base.select(*cols).repartition(32).write.parquet(
        f"{OUT_SKEW}/uniform/events.parquet"
    )
    base.withColumn(
        "user_id", F.when(hot, F.lit(1).cast("long")).otherwise(F.col("user_id"))
    ).select(*cols).repartition(32).write.parquet(
        f"{OUT_SKEW}/skewed/events.parquet"
    )


import re as _re


def exchange_profile(df) -> tuple[int, tuple[str, ...]]:
    """(count, sorted set of partitioning keys) of the shuffles in the
    POST-EXECUTION adaptive final plan.

    Three deliberate normalizations, each cutting a non-cliff artifact
    out of the stability signal:
    - the df must have been executed: AQE's runtime re-plan (e.g. a
      static-estimate sort-merge join converted back to broadcast once
      the build side measures small) is the plan that actually ran —
      judging the pre-runtime estimate would flag size-threshold
      crossings that AQE already handled;
    - the caller builds the df under SPARK_GRAFT_NO_WIDEN=1, because
      `widen_if_few_splits`'s explicit repartition absorbs or displaces
      required exchanges depending on split count (its keys can satisfy
      a downstream ClusteredDistribution at small scale that needs its
      own exchange at large scale, and vice versa) — an artifact of the
      CPU-parallelism knob, not an optimizer decision;
    - stability compares the KEY SET as well as the count: the same
      clustering operations at both scales = no optimizer cliff.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    count = 0
    keys: set[str] = set()
    for line in plan.splitlines():
        if "Exchange" not in line or "BroadcastExchange" in line or "ReusedExchange" in line:
            continue
        if "REPARTITION_BY_NUM" not in line:
            count += 1
        m = _re.search(r"(hashpartitioning|rangepartitioning)\(([^)]*)\)", line)
        if m:
            cols = _re.sub(r"#\d+L?", "", m.group(2))
            cols = ",".join(
                c.strip() for c in cols.split(",") if not c.strip().isdigit()
            )
            keys.add(f"{m.group(1)}({cols})")
        elif "SinglePartition" in line:
            keys.add("SinglePartition")
    return count, tuple(sorted(keys))


def measure(spark, sf_dir: str, queries: list[str] | None = None) -> dict[str, dict]:
    qs = registry.all_queries()
    res: dict[str, dict] = {}
    for name in queries if queries is not None else QUERIES:
        print(f"[scale] measuring {name} @ {sf_dir}", file=sys.stderr, flush=True)
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm-up
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        # untimed shape probe: widen disabled (its exchange absorbs or
        # displaces required ones depending on split count — an
        # artifact, not an optimizer decision), executed via collect so
        # the ADAPTIVE FINAL plan is what exchange_profile reads.
        os.environ["SPARK_GRAFT_NO_WIDEN"] = "1"
        try:
            shape_df = fn(spark, sf_dir)
            shape_df.collect()
            n, keys = exchange_profile(shape_df)
        finally:
            del os.environ["SPARK_GRAFT_NO_WIDEN"]
        res[name] = {"sec": round(best, 3), "exchanges": n, "keys": keys}
        # drop this query's lingering localCheckpoint/cache blocks NOW:
        # the ContextCleaner only releases them once the Python-side
        # DataFrame objects are collected, and letting 3 runs x N
        # queries of checkpointed RDDs pile up OOMed the 8g heap at the
        # 20x graph-band scale (round-10 session) — an artifact of the
        # probe loop, not of any single query's plan
        del shape_df
        import gc  # noqa: PLC0415

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
    return res


def main() -> None:
    # SCALE_ONLY=q1,q2 restricts the run to a sub-band (re-measuring a
    # new addition without repaying the full table); SCALE_SKIP_STAGE=1
    # reuses an existing staging dir from a prior run at the same
    # REPLICAS (the derivation is deterministic, so reuse is exact).
    band = os.environ.get("SCALE_BAND", "")
    queries = {
        "graph": GRAPH_QUERIES,
        "skew": SKEW_QUERIES,
        "stream": STREAM_QUERIES,
        "stopword": STOPWORD_QUERIES,
        "dbscan": DBSCAN_QUERIES,
        "closure": CLOSURE_QUERIES,
        "ann": ANN_QUERIES,
    }.get(band, QUERIES)
    only = os.environ.get("SCALE_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        unknown = keep - set(queries)
        if unknown:
            raise ValueError(f"SCALE_ONLY names not in QUERIES: {sorted(unknown)}")
        queries[:] = [q for q in queries if q in keep]
    spark = get_spark(app_name="tda596-scale-stress")
    if band == "stopword":
        if not (
            os.environ.get("SCALE_SKIP_STAGE") == "1"
            and os.path.exists(OUT_STOPWORD)
        ):
            stage_stopword(spark)
        base = measure(spark, SRC, queries)
        big = measure(spark, OUT_STOPWORD, queries)
        # non-degeneracy: the 10× result must be the SAME stopword list
        # (df shares are scale-invariant on this staging), not empty
        qs = registry.all_queries()
        fn = qs["text_stopword_discovery"]
        small = {
            (r["source"], r["token"], r["df_share_ppm"])
            for r in fn(spark, SRC).collect()
        }
        bigset = {
            (r["source"], r["token"], r["df_share_ppm"])
            for r in fn(spark, OUT_STOPWORD).collect()
        }
        table = {
            q: {
                "sf0.1_sec": base[q]["sec"],
                f"x{REPLICAS}_sec": big[q]["sec"],
                "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
                "exchanges_base": base[q]["exchanges"],
                f"exchanges_x{REPLICAS}": big[q]["exchanges"],
                "shape_stable": base[q]["keys"] == big[q]["keys"],
                "result_invariant": small == bigset and len(small) > 0,
                "n_stopwords": len(small),
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "stopword", "replicas": REPLICAS, "src": SRC,
                 "queries": table},
                indent=2,
            )
        )
        return
    if band == "dbscan":
        if not (
            os.environ.get("SCALE_SKIP_STAGE") == "1"
            and os.path.exists(OUT_DBSCAN)
        ):
            stage_dbscan(spark)
        base = measure(spark, SRC, queries)
        big = measure(spark, OUT_DBSCAN, queries)
        # non-degeneracy: the 10× staging must keep replicas planar-
        # disjoint — total labelled rows grow exactly ×REPLICAS, and
        # the per-role mix stays within a loose band of the base
        qs = registry.all_queries()
        fn = qs["dbscan_embedding_clusters"]
        small = {r["role"]: r["n"] for r in fn(spark, SRC)
                 .groupBy("role").count().withColumnRenamed("count", "n").collect()}
        bigc = {r["role"]: r["n"] for r in fn(spark, OUT_DBSCAN)
                .groupBy("role").count().withColumnRenamed("count", "n").collect()}
        table = {
            q: {
                "sf0.1_sec": base[q]["sec"],
                f"x{REPLICAS}_sec": big[q]["sec"],
                "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
                "exchanges_base": base[q]["exchanges"],
                f"exchanges_x{REPLICAS}": big[q]["exchanges"],
                "shape_stable": base[q]["keys"] == big[q]["keys"],
                "roles_base": small,
                f"roles_x{REPLICAS}": bigc,
                # PER-ROLE exactness is the real overlay detector: total
                # rows always equal REPLICAS x base (DBSCAN labels every
                # point), but an overlaying staging shifts the
                # core/border/noise mix
                "roles_exactly_linear": all(
                    bigc.get(r, 0) == REPLICAS * small.get(r, 0)
                    for r in set(small) | set(bigc)
                ),
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "dbscan", "replicas": REPLICAS, "src": SRC,
                 "queries": table},
                indent=2,
            )
        )
        return
    if band == "ann":
        if not (
            os.environ.get("SCALE_SKIP_STAGE") == "1"
            and os.path.exists(OUT_ANN)
        ):
            stage_ann(spark)
        base = measure(spark, SRC, queries)
        big = measure(spark, OUT_ANN, queries)
        rec_base = ann_recall(spark, SRC)
        rec_big = ann_recall(spark, OUT_ANN)
        floors = {"similarity_ivf_topk": 0.4, "similarity_pq_topk": 0.85}
        table = {
            q: {
                "sf0.1_sec": base[q]["sec"],
                f"x{REPLICAS}_sec": big[q]["sec"],
                "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
                "exchanges_base": base[q]["exchanges"],
                f"exchanges_x{REPLICAS}": big[q]["exchanges"],
                "shape_stable": base[q]["keys"] == big[q]["keys"]
                or (
                    q in BROADCAST_TRANSITION_OK
                    and big[q]["exchanges"] > base[q]["exchanges"]
                ),
                "keys_base": base[q]["keys"],
                f"keys_x{REPLICAS}": big[q]["keys"],
                "recall_at5": f"{rec_base[q]} -> {rec_big[q]}",
                "floor": floors[q],
                "recall_above_floor_at_scale": rec_big[q] >= floors[q],
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "ann", "replicas": REPLICAS, "src": SRC,
                 "queries": table},
                indent=2,
            )
        )
        return
    if band == "closure":
        if not (
            os.environ.get("SCALE_SKIP_STAGE") == "1"
            and os.path.exists(OUT_CLOSURE)
        ):
            stage_closure(spark)
        # Engine finding the band exists to surface: Spark's UnionLoop
        # caps total recursion rows at spark.sql.cteRecursionRowLimit
        # (default 1e6) — the 10× chain table is ~1.9M rows, so the
        # native recursive CTE FAILS at scale unless the operator is
        # deliberately un-capped. Raised for the band, disclosed in
        # BASELINE.md; the doubling query needs no such knob.
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(2_000_000_000))
        base = measure(spark, SRC, queries)
        big = measure(spark, OUT_CLOSURE, queries)
        # integrity closed form (band comment): with constant-width
        # staged keys, Σ subtree_parts = (D+3) · N_base · REPLICAS
        # EXACTLY; any staging that changed tree shape breaks this
        from tda596_lab02mapreduce_spark import io as _io  # noqa: PLC0415

        qs = registry.all_queries()
        fn = qs["bom_subtree_rollup"]
        pairs_small = int(
            fn(spark, SRC).agg(F.sum("subtree_parts")).first()[0]
        )
        pairs_big = int(
            fn(spark, OUT_CLOSURE).agg(F.sum("subtree_parts")).first()[0]
        )
        p = _io.load(spark, SRC, "part")
        n_base = p.count()
        max_digits = len(str(p.agg(F.max("p_partkey")).first()[0]))
        expected_big = REPLICAS * (pairs_small + n_base)
        table = {
            q: {
                "sf0.1_sec": base[q]["sec"],
                f"x{REPLICAS}_sec": big[q]["sec"],
                "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
                "exchanges_base": base[q]["exchanges"],
                f"exchanges_x{REPLICAS}": big[q]["exchanges"],
                "shape_stable": base[q]["keys"] == big[q]["keys"]
                or (
                    q in BROADCAST_TRANSITION_OK
                    and big[q]["exchanges"] > base[q]["exchanges"]
                ),
                "keys_base": base[q]["keys"],
                f"keys_x{REPLICAS}": big[q]["keys"],
                "closure_pairs": f"{pairs_small} -> {pairs_big}",
                "pairs_ratio": round(pairs_big / pairs_small, 2),
                "pairs_exactly_closed_form": pairs_big == expected_big,
                "depth_per_node": f"digits(pk) -> digits(pk)+3 (max {max_digits + 3})",
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "closure", "replicas": REPLICAS, "src": SRC,
                 "queries": table},
                indent=2,
            )
        )
        return
    if band == "stream":
        if not (
            os.environ.get("SCALE_SKIP_STAGE") == "1" and os.path.exists(OUT_STREAM)
        ):
            stage_stream(spark)
        base = measure_stream(spark, SRC, queries)
        os.environ["SPARK_GRAFT_STREAM_MAX_FILES"] = "2"  # 16 parts → 8 batches
        try:
            big = measure_stream(spark, OUT_STREAM, queries)
        finally:
            del os.environ["SPARK_GRAFT_STREAM_MAX_FILES"]
        table = {
            q: {
                "sf0.1_sec": base[q]["sec"],
                f"x{REPLICAS}_sec": big[q]["sec"],
                "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
                "batches": f'{base[q]["n_batches"]} -> {big[q]["n_batches"]}',
                "input_rows": f'{base[q]["input_rows"]} -> {big[q]["input_rows"]}',
                "rows_per_sec": f'{base[q]["rows_per_sec"]} -> {big[q]["rows_per_sec"]}',
                "state_rows_max": f'{base[q]["state_rows_max"]} -> {big[q]["state_rows_max"]}',
                "state_rows_last": f'{base[q]["state_rows_last"]} -> {big[q]["state_rows_last"]}',
                "state_mem_max_mb": f'{base[q]["state_mem_max_mb"]} -> {big[q]["state_mem_max_mb"]}',
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "stream", "replicas": REPLICAS, "src": SRC,
                 "max_files_per_trigger_x10": 2, "queries": table},
                indent=2,
            )
        )
        return
    if band == "skew":
        if not (os.environ.get("SCALE_SKIP_STAGE") == "1" and os.path.exists(OUT_SKEW)):
            stage_skew(spark)
        uni = measure(spark, f"{OUT_SKEW}/uniform", queries)
        skw = measure(spark, f"{OUT_SKEW}/skewed", queries)
        # third pass: AQE's skew mitigations OFF, so the table shows
        # what the runtime re-plan buys for joins (windows/groupBys on
        # one hot key cannot be split by AQE either way)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        spark.conf.set(
            "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled",
            "false",
        )
        try:
            skw_off = measure(spark, f"{OUT_SKEW}/skewed", queries)
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled",
                "true",
            )
        table = {
            q: {
                "uniform_sec": uni[q]["sec"],
                "skew_sec": skw[q]["sec"],
                "skew_ratio": round(skw[q]["sec"] / uni[q]["sec"], 2),
                "skew_noaqeskew_sec": skw_off[q]["sec"],
                "exchanges_uniform": uni[q]["exchanges"],
                "exchanges_skew": skw[q]["exchanges"],
                "shape_stable": uni[q]["keys"] == skw[q]["keys"],
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "skew", "replicas": REPLICAS, "hot_share": "~25%",
                 "src": SRC, "queries": table},
                indent=2,
            )
        )
        return
    if band == "graph":
        if not (os.environ.get("SCALE_SKIP_STAGE") == "1" and os.path.exists(OUT_GRAPH)):
            stage_graph(spark)
        base = measure(spark, SRC, queries)
        big = measure(spark, OUT_GRAPH, queries)
        table = {
            q: {
                "sf0.1_sec": base[q]["sec"],
                f"x{REPLICAS}_sec": big[q]["sec"],
                "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
                "exchanges_base": base[q]["exchanges"],
                f"exchanges_x{REPLICAS}": big[q]["exchanges"],
                "shape_stable": base[q]["keys"] == big[q]["keys"],
                "keys_base": base[q]["keys"],
                f"keys_x{REPLICAS}": big[q]["keys"],
            }
            for q in queries
        }
        print(
            json.dumps(
                {"band": "graph", "replicas": REPLICAS, "src": SRC, "queries": table},
                indent=2,
            )
        )
        return
    if not (os.environ.get("SCALE_SKIP_STAGE") == "1" and os.path.exists(OUT)):
        stage(spark)
    base = measure(spark, SRC)
    big = measure(spark, OUT)
    table = {
        q: {
            "sf0.1_sec": base[q]["sec"],
            "x10_sec": big[q]["sec"],
            "ratio": round(big[q]["sec"] / base[q]["sec"], 2),
            "exchanges_sf0.1": base[q]["exchanges"],
            "exchanges_x10": big[q]["exchanges"],
            "shape_stable": base[q]["keys"] == big[q]["keys"]
            or (
                q in BROADCAST_TRANSITION_OK
                # STRICT growth only: equal counts must still match on
                # keys, or the cliff guard would be disabled for these
                # queries entirely (review catch)
                and big[q]["exchanges"] > base[q]["exchanges"]
            ),
            "keys_sf0.1": base[q]["keys"],
            "keys_x10": big[q]["keys"],
        }
        for q in QUERIES
    }
    print(json.dumps({"replicas": REPLICAS, "src": SRC, "queries": table}, indent=2))


if __name__ == "__main__":
    main()

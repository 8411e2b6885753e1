"""Streaming drift monitoring: the PSI pipeline split into its
streaming-aggregable core (per-bin conditional counts — additive, so
a Structured Streaming grouped aggregate maintains them incrementally
in complete mode, no watermark needed for a global profile) and a
stateless scoring tail that runs on the tiny 10-row aggregate each
time it is emitted.

Batch (queries/driftstats.py:psi_value_drift) and stream
(queries/streaming_batch.py:stream_psi_monitor) share BOTH functions,
so batch-vs-stream invariance is structural, and the DuckDB oracle
that checks the batch form checks the streaming form verbatim.

At scale the counts shuffle 10 rows per micro-batch partial — the
monitor's cost is the events scan it piggybacks on, which is the
whole point of PSI-as-a-stream: the reference profile is a constant,
drift is visible per micro-batch, and nothing driver-sized ever
materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_DEC = "decimal(18,8)"


def psi_bin_counts(events: DataFrame) -> DataFrame:
    """Per-bin (10 fixed-width bins over value, capped at 9) counts of
    the reference (< 2024-01-16) and current halves — sibling
    conditional sums, one pass, additive across micro-batches."""
    binned = events.select(
        F.least(F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9)).alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    return binned.groupBy("bin").agg(
        F.sum("is_ref").alias("ref_cnt"),
        F.sum(1 - F.col("is_ref")).alias("cur_cnt"),
    )


def score_psi(cnts: DataFrame) -> DataFrame:
    """Laplace-smoothed PSI terms + total over a bin-count table —
    stateless, exact-decimal term sums (order-independent)."""
    tot = cnts.agg(
        F.sum("ref_cnt").cast("double").alias("ref_tot"),
        F.sum("cur_cnt").cast("double").alias("cur_tot"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    ref_share = (F.col("ref_cnt") + 1) / (F.col("ref_tot") + F.col("n_bins"))
    cur_share = (F.col("cur_cnt") + 1) / (F.col("cur_tot") + F.col("n_bins"))
    terms = cnts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.round(ref_share, 8).alias("ref_share"),
        F.round(cur_share, 8).alias("cur_share"),
        F.round((ref_share - cur_share) * F.log(ref_share / cur_share), 8)
        .cast(_TERM_DEC)
        .alias("psi_term"),
    )
    # total over the ≤ 10 bin rows rides a broadcast 1-row aggregate
    # (like the per-bin tot above) — no partition-less window node
    grand = terms.agg(F.sum("psi_term").alias("__psi_sum"))
    return terms.crossJoin(F.broadcast(grand)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        "ref_share",
        "cur_share",
        F.col("psi_term").cast("double").alias("psi_term"),
        F.round(F.col("__psi_sum").cast("double"), 6).alias("psi_total"),
    )

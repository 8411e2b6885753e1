"""Properties for the training-run preparation queries beyond the
oracle hash-match (tests/test_queries_oracle.py covers that): rounding
margins that make the float oracles sound, conservation invariants for
sequence packing, stratified-sample guarantees, vocabulary/OOV
behavior, and the plan shapes that make each query scale."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tda596_lab02mapreduce_spark import plans
from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty
from tda596_lab02mapreduce_spark.queries.trainprep import (
    _BM25_TOPK,
    _PACK_SEQ_LEN,
    _STRATA_FRACTION,
    _VOCAB_SIZE,
)
from tda596_lab02mapreduce_spark.registry import get


def _rounding_margin_ok(value: float, dp: int = 4, margin: float = 1e-6) -> bool:
    scaled = value * 10**dp
    return abs(scaled - math.floor(scaled) - 0.5) > margin


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_driver_side_recompute(spark, sf_correctness):
    """Recompute BM25 exactly driver-side from the raw corpus and
    assert (a) every candidate's unrounded score clears the 4-dp
    rounding boundary by a libm-safe margin (the precondition that
    makes ROUND-then-compare sound), and (b) the query's top-k set and
    rounded scores equal the recompute's — the oracle can then only
    agree for the right reason."""
    from tda596_lab02mapreduce_spark.queries.trainprep import _BM25_B, _BM25_K1, _BM25_QUERIES

    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").collect()
    toks = {d.doc_id: re.findall(r"[^\W\d_]+", d.text) for d in docs}
    toks = {d: ws for d, ws in toks.items() if ws}
    n_docs = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    tf: dict[tuple[int, str], int] = {}
    df_: dict[str, set] = {}
    for d, ws in toks.items():
        for w in ws:
            tf[(d, w)] = tf.get((d, w), 0) + 1
            df_.setdefault(w, set()).add(d)
    want: dict[int, list] = {}
    qterms: dict[int, list[str]] = {}
    for qid, t in _BM25_QUERIES:
        qterms.setdefault(qid, []).append(t)
    for qid, terms in qterms.items():
        scored = []
        for d, ws in toks.items():
            hit = [t for t in terms if (d, t) in tf]
            if not hit:
                continue
            s = 0.0
            for t in hit:
                idf = math.log(1 + (n_docs - len(df_[t]) + 0.5) / (len(df_[t]) + 0.5))
                denom = tf[(d, t)] + _BM25_K1 * (
                    1 - _BM25_B + _BM25_B * len(ws) / avgdl
                )
                s += idf * tf[(d, t)] * (_BM25_K1 + 1) / denom
            assert _rounding_margin_ok(s), f"score {s} at a 4-dp boundary"
            scored.append((round(s, 4), d, len(hit)))
        scored.sort(key=lambda x: (-x[0], x[1]))
        want[qid] = scored[:_BM25_TOPK]
    got_rows = get("bm25_topk_retrieval").spark_fn(spark, sf_correctness).collect()
    got: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (-r.bm25, r.doc_id)):
        got.setdefault(r.query_id, []).append((r.bm25, r.doc_id, r.n_terms_hit))
    assert {q: sorted(v) for q, v in got.items()} == {
        q: sorted(v) for q, v in want.items()
    }


def test_bm25_plan_broadcasts_queries(spark, sf_correctness):
    """The query-term table is a literal dim: it must broadcast, and
    the plan must contain no cartesian product (the stats scalar rides
    a broadcast nested loop of one row, which is fine — assert no
    CartesianProduct operator)."""
    df = get("bm25_topk_retrieval").spark_fn(spark, sf_correctness)
    assert plans.has_broadcast_join(df)
    assert not plans.has_operator(df, r"CartesianProduct")


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def test_seq_pack_conserves_tokens(spark, sf_correctness):
    """Conservation: sum of per-chunk n_tokens per source == total
    letter-run tokens of that source's non-empty docs; every chunk
    except the last per source holds exactly _PACK_SEQ_LEN tokens;
    chunk numbering per source is dense from 0."""
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    want = (
        docs.select("source", F.size(tokens_nonempty("text")).alias("n"))
        .filter(F.col("n") > 0)
        .groupBy("source")
        .agg(F.sum("n").alias("total"))
    )
    got = (
        get("seq_pack_concat_chunks")
        .spark_fn(spark, sf_correctness)
        .groupBy("source")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max("chunk_no").alias("max_chunk"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("chunk_no").alias("min_chunk"),
        )
    )
    joined = want.join(got, "source").collect()
    assert joined
    for r in joined:
        assert r["total"] == r[2], f"token loss in source {r['source']}"
        assert r["min_chunk"] == 0
        assert r["n_chunks"] == r["max_chunk"] + 1, "chunk ids not dense"
        assert r["n_chunks"] == math.ceil(r["total"] / _PACK_SEQ_LEN)
    full = (
        get("seq_pack_concat_chunks")
        .spark_fn(spark, sf_correctness)
        .withColumn(
            "is_last",
            F.col("chunk_no") == F.max("chunk_no").over(Window.partitionBy("source")),
        )
        .filter(~F.col("is_last"))
        .filter(F.col("n_tokens") != _PACK_SEQ_LEN)
        .count()
    )
    assert full == 0, "a non-final chunk is not exactly seq_len tokens"


def test_seq_pack_single_keyed_exchange(spark, sf_correctness):
    """The packing window partitions by source: exactly one
    hashpartitioning Exchange on source, no global sort/rangepartition
    (which would mean the window collapsed to a single task)."""
    df = get("seq_pack_concat_chunks").spark_fn(spark, sf_correctness)
    plan = plans.executed_plan(df)
    assert "rangepartitioning" not in plan.lower()
    assert plan.lower().count("hashpartitioning(source") >= 1


# ---------------------------------------------------------------------------
# Vocabulary encode
# ---------------------------------------------------------------------------


def test_vocab_encode_roundtrip_and_oov(spark, sf_correctness):
    """ids decode back to the document's token stream: re-tokenize each
    doc, map through the same top-V vocabulary built independently
    here, and compare with the query's ids string. Also: OOV occurs
    (V=16 < corpus vocab) and n_tok == tokens of the doc."""
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    tok = docs.select("doc_id", F.explode(tokens_nonempty("text")).alias("w"))
    vocab_rows = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_VOCAB_SIZE)
        .collect()
    )
    vid = {r.w: i + 1 for i, r in enumerate(vocab_rows)}
    got = {
        r.doc_id: r
        for r in get("vocab_encode_topk").spark_fn(spark, sf_correctness).collect()
    }
    n_oov_total = 0
    for d in docs.select("doc_id", "text").collect():
        # re-tokenize with the same letter-run rule ([^\W\d_] ≡ \p{L})
        toks = re.findall(r"[^\W\d_]+", d.text)
        if d.doc_id not in got:
            assert not toks
            continue
        r = got[d.doc_id]
        assert r.n_tok == len(toks)
        want_ids = " ".join(str(vid.get(t, 0)) for t in toks)
        assert r.ids == want_ids, f"doc {d.doc_id} encoding mismatch"
        n_oov_total += r.n_oov
    assert n_oov_total > 0, "V=16 should leave OOV tokens; vocab too large?"


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_sizes(spark, sf_correctness):
    """Every stratum contributes exactly ceil(fraction * stratum_n)
    rows — no stratum dropped, no Bernoulli variance — and the selected
    set is the md5-rank prefix (deterministic across runs)."""
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = get("sample_stratified_exact").spark_fn(spark, sf_correctness).collect()
    per_lang: dict[str, int] = {}
    for r in out:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
        assert r.stratum_n == sizes[r.lang]
    assert set(per_lang) == set(sizes), "a stratum was dropped"
    for lang, n in sizes.items():
        assert per_lang[lang] == math.ceil(_STRATA_FRACTION * n)
    again = get("sample_stratified_exact").spark_fn(spark, sf_correctness).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


# ---------------------------------------------------------------------------
# BPE merge candidates
# ---------------------------------------------------------------------------


def test_bpe_top_merges_matches_recompute(spark, sf_correctness):
    """Driver-side recompute of frequency-weighted adjacent char-pair
    counts equals the query's top-k exactly (integer counts, lexical
    tiebreak ⇒ no float hazard); ranks are dense 1..k."""
    from tda596_lab02mapreduce_spark.queries.trainprep import _BPE_TOP

    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").collect()
    wf: dict[str, int] = {}
    for d in docs:
        for w in re.findall(r"[^\W\d_]+", d.text):
            wf[w] = wf.get(w, 0) + 1
    pc: dict[tuple[str, str], int] = {}
    for w, f in wf.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + f
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP]
    got = sorted(
        get("bpe_top_merges").spark_fn(spark, sf_correctness).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    assert [((r.left_sym, r.right_sym), r.pair_count) for r in got] == want


# ---------------------------------------------------------------------------
# Bigram LM score
# ---------------------------------------------------------------------------


def test_lm_bigram_rounding_margin_and_model(spark, sf_correctness):
    """(a) the 4-dp ROUND in the oracle is only sound with a margin —
    recompute each doc's unrounded avg_nll driver-side from the same
    counts and assert distance from every .00005 boundary; (b) sanity:
    a doc made of the corpus's most common bigrams scores LOWER nll
    than the rarest-bigram doc (the filter actually orders fluency)."""
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    tok = docs.select(
        "doc_id", F.posexplode(tokens_nonempty("text")).alias("p", "w")
    ).collect()
    by_doc: dict[int, list[str]] = {}
    for r in tok:
        by_doc.setdefault(r.doc_id, []).append((r.p, r.w))
    bigrams: dict[int, list[tuple[str, str]]] = {}
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for d, ws in by_doc.items():
        ws = [w for _, w in sorted(ws)]
        vocab.update(ws)
        bs = list(zip(ws, ws[1:]))
        bigrams[d] = bs
        for b in bs:
            c2[b] = c2.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    v = len(vocab)
    got = {
        r.doc_id: r
        for r in get("lm_bigram_score").spark_fn(spark, sf_correctness).collect()
    }
    assert set(got) == {d for d, bs in bigrams.items() if bs}
    for d, bs in bigrams.items():
        if not bs:
            continue
        nll = -sum(math.log((c2[b] + 1.0) / (c1[b[0]] + v)) for b in bs) / len(bs)
        assert _rounding_margin_ok(nll), f"doc {d} avg_nll {nll} at 4-dp boundary"
        assert abs(round(nll, 4) - got[d].avg_nll) < 2e-4
        assert got[d].n_bigrams == len(bs)


def test_lm_bigram_no_collect_in_plan(spark, sf_correctness):
    """The LM 'model' stays distributed: keyed joins on (w1,w2)/w1,
    no cartesian; the only broadcast is the 1-row vocabulary size."""
    df = get("lm_bigram_score").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, r"CartesianProduct")


def test_group_kfold_no_leakage(spark, sf_correctness):
    """Structural no-leakage: the fold is a pure function of user_id,
    so re-deriving folds at EVENT grain must put every user's events in
    exactly one fold; fold sizes must be non-degenerate (all 5 folds
    populated — md5 is uniform, the fixture has ~2k users)."""
    from tda596_lab02mapreduce_spark import io as _io

    ev = _io.load(spark, sf_correctness, "events").select("user_id")
    per_event = ev.select(
        "user_id",
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 5
        ).alias("fold"),
    )
    from tda596_lab02mapreduce_spark.registry import get

    leaky = (
        per_event.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert leaky == 0
    folds = get("split_group_kfold").spark_fn(spark, sf_correctness).collect()
    assert len(folds) == 5
    assert min(f["n_users"] for f in folds) > 0
    # shares sum to ~1e6 (floor division loses < 5 ppm)
    s = sum(f["share_ppm"] for f in folds)
    assert 1_000_000 - 5 <= s <= 1_000_000


def test_temporal_holdout_no_future_leakage(spark, sf_correctness):
    """The defining property of a temporal split: every user's min test
    timestamp is >= their max train timestamp (the holdout is the
    user's FUTURE), and each user contributes at most 2 test events."""
    from tda596_lab02mapreduce_spark import io as _io

    ev = _io.load(spark, sf_correctness, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    tagged = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "split", F.when(F.col("rn") <= 2, "test").otherwise("train")
    )
    per_user = tagged.groupBy("user_id").agg(
        F.min(F.when(F.col("split") == "test", F.col("ts"))).alias("min_test"),
        F.max(F.when(F.col("split") == "train", F.col("ts"))).alias("max_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
    )
    bad = per_user.filter(
        F.col("max_train").isNotNull() & (F.col("min_test") < F.col("max_train"))
    ).count()
    assert bad == 0
    assert per_user.filter(F.col("n_test") > 2).count() == 0
    # the rollup conserves events
    from tda596_lab02mapreduce_spark.registry import get

    roll = get("split_temporal_holdout").spark_fn(spark, sf_correctness).collect()
    assert sum(r["n_events"] for r in roll) == ev.count()


def test_shard_bin_packing_balance(spark, sf_correctness):
    """Round-robin-by-size invariants: shard counts differ by <= 1 and
    every doc lands in exactly one shard (totals conserve)."""
    from tda596_lab02mapreduce_spark import io as _io
    from tda596_lab02mapreduce_spark.registry import get

    docs = _io.load(spark, sf_correctness, "documents")
    rows = get("shard_bin_packing").spark_fn(spark, sf_correctness).collect()
    assert len(rows) == 16
    counts = [r["n_docs"] for r in rows]
    assert max(counts) - min(counts) <= 1
    assert sum(r["total_chars"] for r in rows) == docs.agg(
        F.sum("n_chars")
    ).collect()[0][0]
    # LPT round-robin keeps per-shard char totals within one stratum
    # span of each other: bound by the max doc size times the number of
    # strata-boundary offsets (loose but catches a broken rank)
    totals = [r["total_chars"] for r in rows]
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    n_strata = (sum(counts) + 15) // 16
    assert max(totals) - min(totals) <= max_doc * n_strata


def test_mix_allocation_budget_conserved(spark, sf_correctness):
    """Target tokens split the budget by share (sum within ppm floor
    loss of the budget), and a source with target share above its
    inventory share must show epochs > 1000 milli."""
    from tda596_lab02mapreduce_spark.registry import get

    rows = get("dataset_mix_allocation").spark_fn(spark, sf_correctness).collect()
    assert {r["lang"] for r in rows} == {"en", "de", "fr"}
    budget = sum(r["n_tokens"] for r in rows)
    tgt_sum = sum(r["target_tokens"] for r in rows)
    assert budget - 3 <= tgt_sum <= budget
    for r in rows:
        assert r["epochs_milli"] == (1000 * r["target_tokens"]) // r["n_tokens"]


def test_bpe_train_merges_applies_merges_and_handles_runs(spark, tmp_path):
    """The trainer must actually APPLY each round's merge: build a
    corpus where round 2's best pair contains round 1's merged symbol,
    and where a run of identical symbols merges floor(k/2) times
    (greedy left-to-right, the classic BPE rule). A counts-only
    implementation that never re-segments fails both."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark.queries.trainprep import (
        bpe_train_merges,
    )

    # 'abab' x10: round 1 merges (a,b)->ab (count 20: 2 per word).
    # After applying, words are [ab, ab] so round 2's top pair is
    # (ab, ab) -> abab with count 10 — only reachable by re-segmenting.
    # 'cccc' x3 pins the run rule: (c,c) counts floor(4/2)*3=6... but
    # pair COUNTING over 'c c c c' sees 3 adjacencies x3 = 9 < 20.
    docs = spark.createDataFrame(
        [(i, "abab", 4) for i in range(10)]
        + [(100 + i, "cccc", 4) for i in range(3)],
        "doc_id long, text string, n_chars long",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        int(r["round"]): (r["left_sym"], r["right_sym"], int(r["pair_count"]))
        for r in bpe_train_merges(spark, str(tmp_path)).collect()
    }
    assert rows[1] == ("a", "b", 20)
    # round 2: words are now [ab, ab] — the merged SYMBOL pairs with
    # itself (count 10); (c,c) has 9 by the greedy adjacency count
    assert rows[2] == ("ab", "ab", 10)
    # round 3: 'abab' is one symbol; only the c-run remains. After
    # merging (c,c) greedily each 'cccc' is [cc, cc]
    assert rows[3] == ("c", "c", 9)

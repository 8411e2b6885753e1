"""Deduplication operators for LLM-corpus pipelines (SURVEY.md §2C).

All candidate generation is strictly sub-quadratic: banding/bucketing
turns pair discovery into an equi-join on bucket keys, so cost is
O(candidates), never O(n²). Payload text never rides a shuffle —
only ids + hashes/signatures do; verification joins the payload back
by id afterwards.

Everything is built-in Column expressions (codegen'd, no Python in
the hot path). Signature construction is row-local (zero shuffle);
the only wide ops are the bucket join and the final dedup decision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tda596_lab02mapreduce_spark.functions.text import ngram_shingles, tokens_nonempty


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact content dedup: keep the lowest-id row per distinct text.

    Shuffles only (sha256, id) — not the payload (reference analogue:
    emit hash as key; SURVEY.md §2C 'shuffle on hash only')."""
    h = F.sha2(F.col(text_col), 256).alias("__h")
    w = Window.partitionBy("__h").orderBy(F.col(id_col))
    return (
        df.select(F.col(id_col), h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col)
        .join(df, id_col)
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as strings (row-local). Short docs (< k tokens)
    yield their whole token run as the single shingle. The zip_with
    construction (functions/text.py:ngram_shingles) keeps the tokenize
    subtree O(1)-per-row instead of re-evaluated per shingle."""
    toks = tokens_nonempty(text)
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        ngram_shingles(toks, k)
    )


def minhash_signature(shingle_col: Column, num_perm: int) -> Column:
    """num_perm-wide MinHash signature as ONE fold over the shingle
    array: the accumulator is the running element-wise min of the
    num_perm hash family (seed = permutation index folded into
    xxhash64). Row-local.

    Single-pass matters: the naive per-permutation form
    ``array(array_min(transform(shingles, h_i)) for i in ...)`` embeds
    the shingle-construction subtree num_perm times, and Catalyst's
    projection collapse multiplies that again at every consumer —
    measured 100×+ slowdown at sf0.1. Here the shingle subtree occurs
    exactly once."""
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_perm)
    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(num_perm - 1)),
                lambda i: F.xxhash64(s, i),
            ),
            lambda a, h: F.least(a, h),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    n_partitions: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    signature (row-local) → explode into `bands` band-hashes →
    self-equi-join on (band, band_hash) with id_a < id_b → distinct
    pairs. Returns (id_a, id_b). A pair surfaces iff the docs collide
    in ≥1 band — the classic S-curve; guaranteed to contain all exact
    duplicates (tested property).

    ``n_partitions``: optionally repartition before the (compute-bound)
    signature projection. On a real cluster the scan already yields
    enough splits; on few-split inputs this decouples CPU parallelism
    from file layout.

    The banding generator is likewise a SINGLE expression (explode of
    transform over band indices) so the signature subtree — and the
    shingle subtree inside it — is evaluated once per row, not once
    per band."""
    rows_per_band = num_perm // bands
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    if n_partitions:
        src = src.repartition(n_partitions, "__id")
    sig = minhash_signature(shingles(F.col("__text"), shingle_k), num_perm)
    banded = src.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(sig, b * rows_per_band + 1, F.lit(rows_per_band)),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("__id", "bh.band", "bh.band_hash")
    # Explicit repartition on the join key makes both self-join sides an
    # IDENTICAL exchange, so the signature projection runs ONCE and the
    # second side reads the same shuffle output (AQE stage reuse) —
    # without it the planner broadcasts one side and re-evaluates the
    # whole MinHash fold for it (measured 2.9s → 1.7s at sf0.1).
    banded = banded.repartition(*(
        [n_partitions] if n_partitions else []), "band", "band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Fused MinHash-LSH + Jaccard verify in ONE corpus pass.

    The composable pipeline (minhash_lsh_pairs → jaccard_verify) scans
    the corpus three times (signature, set_a join, set_b join) and
    shuffles the shingle sets twice. Here the distinct shingle set is
    computed once, the signature is derived from it in the same
    projection, and the set rides the band exchange — so the self-join
    output already carries (set_a, set_b) and verification is a
    row-local expression. Candidate pairs are deduped BEFORE the
    Jaccard so a pair colliding in several bands is verified once.

    Scale ledger vs the composable pipeline: one corpus scan instead
    of three, and one shuffle instead of three — at the price of the
    band exchange carrying ``bands`` copies of each shingle set
    instead of ids only. Still strictly sub-quadratic: the join is an
    equi-join on (band, band_hash); identical-exchange both sides, so
    the shuffle is written once (AQE stage reuse). 3.5s → 1.3s at
    sf0.1. Returns (id_a, id_b, jaccard) with jaccard ≥ threshold."""
    rows_per_band = num_perm // bands
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    if n_partitions:
        src = src.repartition(n_partitions, "__id")
    # MinHash over the distinct set ≡ MinHash over the multiset (min is
    # duplicate-blind), so one array serves signature AND verify.
    sets = src.select(
        "__id", F.array_distinct(shingles(F.col("__text"), shingle_k)).alias("__set")
    )
    sig = minhash_signature(F.col("__set"), num_perm)
    banded = sets.select(
        "__id",
        "__set",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(sig, b * rows_per_band + 1, F.lit(rows_per_band)),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("__id", "__set", "bh.band", "bh.band_hash")
    banded = banded.repartition(
        *([n_partitions] if n_partitions else []), "band", "band_hash"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__set").alias("set_a"),
            F.col("b.__set").alias("set_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 3,
    threshold: float = 0.8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs; keeps pairs ≥ threshold.
    Joins shingle sets back by id (two broadcast-or-shuffle hash joins
    on ids — O(candidates), not O(n²))."""
    src = df.select(F.col(id_col).alias("__id0"), F.col(text_col).alias("__text"))
    if n_partitions:
        src = src.repartition(n_partitions, "__id0")
    sets = src.select(
        F.col("__id0").alias("__id"),
        F.array_distinct(shingles(F.col("__text"), shingle_k)).alias("__set"),
    )
    j = (
        pairs.join(sets.withColumnRenamed("__id", "id_a").withColumnRenamed("__set", "set_a"), "id_a")
        .join(sets.withColumnRenamed("__id", "id_b").withColumnRenamed("__set", "set_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def _token_votes(t: Column, bits: int) -> Column:
    """±1 vote vector for one token. ONE xxhash64 call rendered to a
    two's-complement bit string by bin(), not 64 shiftright probes of
    64 separate hash calls (expression-blowup trap, measured 10-100×
    at sf0.1 — see minhash_signature note)."""
    return F.transform(
        F.split(F.lpad(F.bin(F.xxhash64(t)), bits, "0"), ""),
        lambda c: F.when(c == "1", F.lit(1)).otherwise(F.lit(-1)).cast("long"),
    )


def _pack_counters(counters: Column, bits: int) -> Column:
    """Sign of each counter → packed long. Multiplies by a LITERAL
    weight array (zip_with references `counters` once), not 64 chained
    when(element_at(counters, b)...) each inlining the whole fold.
    bin() is MSB-first, so weight[i] = bit (bits-1-i); index 0 is the
    sign bit of the packed long."""
    weights = F.array(
        *[
            F.lit(-(1 << (bits - 1)) if i == 0 else (1 << (bits - 1 - i))).cast("long")
            for i in range(bits)
        ]
    )
    return F.aggregate(
        F.zip_with(
            counters,
            weights,
            lambda c, w: F.when(c > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def _simhash_occurrence_fold(text: Column, *, bits: int = 64) -> Column:
    """Reference SimHash fold: one vote fold per token OCCURRENCE.
    Kept as the semantic baseline for the parity test of the
    run-length-optimized simhash() below."""
    toks = tokens_nonempty(text)
    counters = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(acc, _token_votes(t, bits), lambda a, v: a + v),
    )
    return _pack_counters(counters, bits)


def simhash(text: Column, *, bits: int = 64) -> Column:
    """64-bit SimHash of the token multiset — entirely row-local
    (one aggregate fold over the token array, no explode/shuffle).

    Each token's xxhash64 votes ±1 per bit position; the signature
    packs the sign of each counter. Near-dup pairs then differ in few
    bits (hamming), discoverable by chunk-banding.

    Run-length optimization: sum of votes over a multiset equals
    count × vote summed over DISTINCT tokens, so the fold walks the
    SORTED token array carrying (prev, run_count, counters) state and
    pays the heavy per-token vote expansion once per distinct run,
    not once per occurrence — bit-identical signatures (parity-tested
    against _simhash_occurrence_fold), ~repetition-factor fewer hash
    expansions per document, still O(n log n) row-local with no
    quadratic distinct×occurrence scan."""
    toks = F.array_sort(tokens_nonempty(text))
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)

    def flush(st: Column) -> Column:
        # fold the finished run into the counters: counters += cnt × votes(prev)
        # (st is a lambda VARIABLE — referencing it repeatedly does not
        # re-inline the accumulated subtree, unlike a computed Column)
        return F.zip_with(
            st.getField("acc"),
            _token_votes(st.getField("prev"), bits),
            lambda a, v: a + v * st.getField("cnt"),
        )

    def merge(st: Column, t: Column) -> Column:
        same = t == st.getField("prev")
        return F.when(
            same,
            F.struct(
                st.getField("prev").alias("prev"),
                (st.getField("cnt") + F.lit(1).cast("long")).alias("cnt"),
                st.getField("acc").alias("acc"),
            ),
        ).otherwise(
            F.struct(
                t.alias("prev"),
                F.lit(1).cast("long").alias("cnt"),
                flush(st).alias("acc"),
            )
        )

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        zeros.alias("acc"),
    )
    counters = F.aggregate(toks, init, merge, flush)
    # coalesce makes the signature NON-NULLABLE (null text → 0, same as
    # empty text). Load-bearing for the plan, not just semantics: a
    # downstream `hamming <= k` filter makes Catalyst infer
    # isnotnull(bit_count(a ^ b)) → isnotnull(__sh) per side, and that
    # inferred predicate — containing this ENTIRE fold — gets pushed
    # into the parquet scan's Filter, evaluating the signature twice
    # per side (measured 2.9s vs 1.5s at sf0.1). Non-nullable output
    # constant-folds the inferred IsNotNull away.
    return F.coalesce(_pack_counters(counters, bits), F.lit(0).cast("long"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 8,
    chunks: int = 4,
    n_partitions: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    `chunks` 16-bit pieces (pigeonhole: hamming ≤ chunks-1 guarantees
    one identical chunk; practical recall for ≤ max_hamming), join on
    identical chunks, verify with popcount of XOR.

    With ``n_partitions`` the signature projection runs after a
    repartition — parallel on few-split inputs, and the Exchange is a
    projection-collapse barrier so the fold isn't re-inlined per chunk."""
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    if n_partitions:
        src = src.repartition(n_partitions, "__id")
    sh = src.select("__id", simhash(F.col("__text")).alias("__sh"))
    if n_partitions:
        sh = sh.repartition(n_partitions, "__id")
    width = 64 // chunks
    banded = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("__sh"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select("__id", "__sh", "cv.chunk", "cv.chunk_val")
    # identical-exchange self-join: signature computed once, second side
    # reuses the shuffle (see minhash_lsh_pairs note)
    banded = banded.repartition(*(
        [n_partitions] if n_partitions else []), "chunk", "chunk_val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)

"""Multinomial Naive Bayes language classifier with a micro-unit
log-weight sidecar — the GENERATIVE member of the trained-model family
(logistic GD = discriminative GLM, kmeans = clustering, BPE = tokenizer).

The cross-engine exactness problem for NB is the logarithm: Spark's
JVM ``Math.log`` and DuckDB's libm ``ln`` are not guaranteed to agree
to the last ulp, so per-row log-likelihoods computed independently in
each engine could hash-mismatch.  The kmeans/PCA sidecar discipline
(operators/kmeans.py) removes the exposure entirely:

- FIT is distributed: token×class occurrence counts and class totals
  are exact BIGINT aggregates (one scan + one (vocab × classes)-bounded
  group-by).  Only the counts table — 31 tokens × 5 langs on the
  fixture, top-V capped at web scale — reaches the driver.
- The driver quantizes Laplace-smoothed log-probabilities ONCE to
  integer micro-units, ``w_u(t,c) = round(1e6 * ln((cnt+1)/(N_c+V)))``,
  and persists them as a committed JSON sidecar under ``.models/``.
- SERVE is deterministic integer arithmetic GIVEN the model: tokenize
  (split on the fixture's single-space delimiter — exactly replayable
  as ``string_split`` in DuckDB), broadcast-join the V×C weight table,
  per-(doc, class) BIGINT score = prior_u + Σ w_u, argmax with a
  lexical class tiebreak (min over (-score, class) — a total order).
- The ORACLE embeds the same sidecar as a literal VALUES table, so
  both engines sum identical integers — no transcendental ever
  evaluates inside either engine.

At 100 TB: the fit is one map-side-combinable count aggregate whose
output is vocabulary-bounded (cap the vocabulary to the distributed
top-V by global count first — the vocab_top_k query's shape); the
serve is tokenize → broadcast join → one doc-keyed aggregate: a single
shuffle at document grain, no windows, no driver loops.

Near-chance accuracy is the honest expected result on the synthetic
fixture (token distributions barely differ by lang); as with
logistic_gd_priority the gate checks the TRAINING + SERVING algebra,
not the data.

Reference parity: the reference engine (mr/worker.go MapReduce) has no
model training; this extends SURVEY.md §2C's trained-model band.
"""

from __future__ import annotations

import hashlib
import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NB_MODEL_CACHE: dict[tuple, dict] = {}


def _model_cache_dir() -> str:
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".models",
    )
    return os.environ.get("SPARK_GRAFT_MODEL_DIR", default)


def _sidecar_path(key: tuple) -> str:
    return os.path.join(
        _model_cache_dir(),
        "nb_" + hashlib.sha256(repr(key).encode()).hexdigest()[:16] + ".json",
    )


def _w_u(num: int, den: int) -> int:
    """round(1e6 * ln(num/den)) — evaluated ONCE driver-side; the
    integer result is what both engines see."""
    return round(1_000_000 * math.log(num / den))


def naive_bayes_fit(
    docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    dataset_key: str | None = None,
    refit: bool = False,
) -> dict:
    """Fit (or fetch) the multinomial NB model.  Returns
    ``{"classes": [...], "priors_u": {c: int}, "weights_u":
    {token: {c: int}}, "vocab": [...]}`` — all weights integer
    micro-units of the Laplace-smoothed log-probabilities."""
    key = (dataset_key, text_col, label_col)
    if dataset_key is not None and not refit:
        if key in _NB_MODEL_CACHE:
            return _NB_MODEL_CACHE[key]
        path = _sidecar_path(key)
        if os.path.exists(path):
            with open(path) as f:
                model = json.load(f)
            _NB_MODEL_CACHE[key] = model
            return model

    tok = docs.select(
        F.col(label_col).alias("c"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    ).filter(F.length("t") > 0)
    # ONE vocabulary×classes-bounded aggregate; exact BIGINT counts.
    counts = tok.groupBy("c", "t").agg(F.count(F.lit(1)).alias("n")).collect()
    doc_counts = (
        docs.groupBy(F.col(label_col).alias("c"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .collect()
    )

    classes = sorted({r["c"] for r in doc_counts})
    vocab = sorted({r["t"] for r in counts})
    V = len(vocab)
    cnt = {(r["c"], r["t"]): int(r["n"]) for r in counts}
    n_tok = {c: sum(v for (cc, _), v in cnt.items() if cc == c) for c in classes}
    nd = {r["c"]: int(r["nd"]) for r in doc_counts}
    nd_all = sum(nd.values())

    priors_u = {c: _w_u(nd[c], nd_all) for c in classes}
    weights_u = {
        t: {c: _w_u(cnt.get((c, t), 0) + 1, n_tok[c] + V) for c in classes}
        for t in vocab
    }
    model = {
        "classes": classes,
        "priors_u": priors_u,
        "weights_u": weights_u,
        "vocab": vocab,
    }
    if dataset_key is not None:
        _NB_MODEL_CACHE[key] = model
        os.makedirs(_model_cache_dir(), exist_ok=True)
        path = _sidecar_path(key)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(model, f)
        os.replace(tmp, path)
    return model


def naive_bayes_confusion(
    docs: DataFrame,
    model: dict,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classify every document and return the confusion matrix
    (true_lang, pred_lang, n_docs) — ≤ |classes|² rows, all exact.

    Plan: tokenize → broadcast-join the V×C integer weight table →
    one (doc, class) aggregate → per-doc argmax via min(struct(-score,
    class)) (total order: score DESC, class ASC) → classes²-bounded
    rollup.  Tokens outside the training vocabulary drop at the inner
    join — identically in the oracle."""
    spark = docs.sparkSession
    wrows = [
        (t, c, int(model["weights_u"][t][c]))
        for t in model["vocab"]
        for c in model["classes"]
    ]
    weights = spark.createDataFrame(wrows, "t string, c string, w_u bigint")
    prows = [(c, int(model["priors_u"][c])) for c in model["classes"]]
    priors = spark.createDataFrame(prows, "c string, prior_u bigint")

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("true_lang"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    ).filter(F.length("t") > 0)
    scores = (
        tok.join(F.broadcast(weights), "t")
        .groupBy("doc_id", "true_lang", "c")
        .agg(F.sum("w_u").cast("bigint").alias("s"))
        .join(F.broadcast(priors), "c")
        .withColumn("score_u", F.col("s") + F.col("prior_u"))
    )
    pred = scores.groupBy("doc_id", "true_lang").agg(
        F.min(F.struct((-F.col("score_u")).alias("neg"), F.col("c").alias("c")))
        .getField("c")
        .alias("pred_lang")
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def naive_bayes_oracle_sql(
    sf_dir: str,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay against the committed sidecar: identical literal
    integer weights, identical tokenize/join/sum, identical
    (score DESC, class ASC) argmax."""
    key = (sf_dir, text_col, label_col)
    path = _sidecar_path(key)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"canonical naive-bayes sidecar missing: {path} — run the "
            f"naive_bayes_lang_confusion query once at {sf_dir} to fit "
            "and persist it (the committed .models/ files are the "
            "canonical serving models)"
        )
    with open(path) as f:
        model = json.load(f)

    def q(s: str) -> str:
        # SQL string-literal escape: a token/class containing an
        # apostrophe ("don't") must not break the generated VALUES
        return "'" + str(s).replace("'", "''") + "'"

    wrows = ",\n".join(
        f"({q(t)}, {q(c)}, {int(model['weights_u'][t][c])})"
        for t in model["vocab"]
        for c in model["classes"]
    )
    prows = ",\n".join(
        f"({q(c)}, {int(model['priors_u'][c])})" for c in model["classes"]
    )
    return f"""
WITH w(t, c, w_u) AS (VALUES
{wrows}
),
pri(c, prior_u) AS (VALUES
{prows}
),
tok AS (
  SELECT {id_col} AS doc_id, {label_col} AS true_lang,
         unnest(string_split({text_col}, ' ')) AS t
  FROM documents
),
scores AS (
  SELECT tok.doc_id, tok.true_lang, w.c,
         CAST(SUM(w.w_u) AS BIGINT) + MIN(pri.prior_u) AS score_u
  FROM tok
  JOIN w   ON w.t = tok.t
  JOIN pri ON pri.c = w.c
  WHERE length(tok.t) > 0
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, true_lang, c AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_u DESC, c) AS rn
  FROM scores
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY 1, 2
"""

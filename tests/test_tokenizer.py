"""Tokenizer fidelity (SURVEY.md §7 risk (c)): Java regex ``\\p{L}``
(Spark), Go ``unicode.IsLetter`` (the reference, modeled by Python's
``str.isalpha`` per rune), and Python ``re`` must agree on what a
"word" is — the flagship wordcount's correctness rests on it
(mrapps/wc.go:21-24).

Property-based: hypothesis generates adversarial mixed-script text
(letters of many scripts, digits, punctuation, whitespace, emoji);
each example batch becomes one single-column DataFrame so one Spark
job checks ~everything hypothesis found interesting.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty


def _go_is_letter_runs(text: str) -> list[str]:
    """Reference semantics, modeled directly: maximal runs of runes r
    with unicode.IsLetter(r). Python's str.isalpha() is the same
    Unicode category-L test."""
    runs: list[str] = []
    cur: list[str] = []
    for ch in text:
        if ch.isalpha():
            cur.append(ch)
        elif cur:
            runs.append("".join(cur))
            cur = []
    if cur:
        runs.append("".join(cur))
    return runs


# mixed-script alphabet: Latin/accents/Greek/Cyrillic/CJK/Arabic letters,
# digits (incl. non-ASCII digits — NOT letters), punctuation, whitespace,
# symbols/emoji, combining marks (category M — not letters)
_ALPHABET = st.sampled_from(
    list("abcXYZéüßñΩλжщ漢字かな한글عربى0123456789٣٤  \t\n.,;:!?-_'\"()[]@#$%^&*+=/\\|~`€£¥©®™…—–‘’“”§¶•°±×÷")
    + ["😀", "🚀", "́", "‍", "­"]
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet=_ALPHABET, max_size=60), min_size=1, max_size=25))
def test_spark_tokenizer_matches_go_semantics(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.text, list(r.toks))
        for r in df.select("text", tokens_nonempty("text").alias("toks")).collect()
    ]
    for text, toks in got:
        assert toks == _go_is_letter_runs(text), (
            f"tokenizer drift on {text!r}: spark={toks} go-model={_go_is_letter_runs(text)}"
        )


def test_wordcount_corpus_matches_python_model(spark, sf_smoke):
    """Whole-fixture-corpus agreement: Spark's per-doc token multiset
    equals the Python Go-model's on every document."""
    from tda596_lab02mapreduce_spark import io

    docs = io.load(spark, sf_smoke, "documents")
    rows = docs.select(
        "doc_id", "text", tokens_nonempty("text").alias("toks")
    ).collect()
    for r in rows:
        assert list(r.toks) == _go_is_letter_runs(r.text), f"doc {r.doc_id} drifted"


_NL_NO_ALPHABET = st.sampled_from(
    list("abⅫ½①xyzⅣ⅛⑩é٣漢 .,") + ["Ⅻ", "№"]
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet=_NL_NO_ALPHABET, max_size=40))
def test_facade_letter_runs_matches_go_model(text):
    """ADVICE r1: apps._letter_runs must agree with the Go isalpha
    model on Nl/No numerics ('Ⅻ', '½', '①'), which stdlib \\w counts
    as word chars but unicode.IsLetter rejects — including mid-run
    splits like 'abⅫcd' → ('ab', 'cd')."""
    from tda596_lab02mapreduce_spark.apps import _letter_runs

    assert _letter_runs(text) == _go_is_letter_runs(text), text


def test_facade_letter_runs_splits_on_numeric_letters():
    from tda596_lab02mapreduce_spark.apps import _letter_runs

    assert _letter_runs("abⅫcd ½x ①") == ["ab", "cd", "x"]


def test_redact_pii_semantics(spark):
    from tda596_lab02mapreduce_spark.functions.text import redact_pii

    cases = [
        # email swallowed whole, including dotted/digit local parts
        ("mail bob.smith+x9@sub.example.org now", "mail <EMAIL> now"),
        # IP redacted before the shorter phone pattern can bite fragments
        ("srv 192.168.0.1 up", "srv <IP> up"),
        # phone
        ("call 555-0134 today", "call <PHONE> today"),
        # replace-all, mixed types in one string
        (
            "a@b.co c@d.io 10.0.0.2 555-1234",
            "<EMAIL> <EMAIL> <IP> <PHONE>",
        ),
        # no false positives: bare words, short digit runs, version-ish
        ("plain words 12-34 v1.2 stay", "plain words 12-34 v1.2 stay"),
    ]
    df = spark.createDataFrame(cases, ["raw", "want"])
    got = df.select("want", redact_pii("raw").alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"], (r["got"], r["want"])

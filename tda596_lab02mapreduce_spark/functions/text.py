"""Text column expressions.

The tokenizer reproduces the reference word-count semantics exactly
(reference ``mrapps/wc.go:21-24``): words are maximal runs of Unicode
letters — digits and punctuation are separators — case-sensitive, no
lowercasing. Java regex ``\\p{L}`` ≡ Go ``unicode.IsLetter`` ≡ DuckDB
RE2 ``\\p{L}`` on this corpus (property-tested in
``tests/test_tokenizer.py``).

All of these are pure Column expressions: JVM-side, inside
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Maximal runs of non-letters separate tokens (wc.go:21 `!unicode.IsLetter(r)`).
NON_LETTER_RE = r"[^\p{L}]+"


def tokenize(text: Column | str) -> Column:
    """``text -> array<string>`` of letter-run tokens (may contain one
    leading/trailing empty string when text starts/ends with a
    separator — filter with :func:`tokens_nonempty`)."""
    return F.split(F.col(text) if isinstance(text, str) else text, NON_LETTER_RE)


def tokens_nonempty(text: Column | str) -> Column:
    """``text -> array<string>`` with empty tokens removed; the exact
    emission set of the reference mapper (wc.go:24-31)."""
    return F.filter(tokenize(text), lambda t: t != F.lit(""))


# --- PII redaction -------------------------------------------------
# Patterns stay inside the Java-regex ∩ RE2 common subset (classes,
# bounded repetition, \b, \d) so the DuckDB oracle can run the SAME
# pattern strings — the redaction rule itself is what's hash-checked.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(text: Column | str) -> Column:
    """Replace every email / IPv4 / phone occurrence with a typed
    placeholder. Order is load-bearing: emails first (their local part
    may contain digits), then IPs (dotted digit runs) before the
    shorter phone pattern can bite fragments of them. Pure
    ``regexp_replace`` chain — JVM-side, codegen-friendly, no UDF."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, tag in PII_PATTERNS:
        col = F.regexp_replace(col, pat, tag)
    return col

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

"""Reference application plugins re-expressed as plain Python
callables for the MapReduce façade (plugin .so loading,
main/mrworker.go:32-49, becomes ordinary closure shipping).

- ``wc_map``/``wc_reduce``: exact mrapps/wc.go semantics — words are
  maximal runs of Unicode letters, case-sensitive, count = len(values).
- ``indexer_map``/``indexer_reduce``: the missing indexer.go app
  (referenced by main/test-mr.sh:63-70): word -> "n_docs doc1,doc2,..."
  with a sorted distinct document list.
"""

from __future__ import annotations

import re
from itertools import groupby


def _letter_runs(text: str) -> list[str]:
    # Go unicode.IsLetter == category L* == str.isalpha per rune. The
    # stdlib-re approximation [^\W\d_]+ is NOT equivalent: \w includes
    # Nl/No numerics ('Ⅻ', '½', '①') that \d does not subtract, so a
    # run like "abⅫcd" must split into ("ab","cd"), not survive whole.
    # Fast path: regex runs, re-split only those containing non-alpha.
    out: list[str] = []
    for t in re.findall(r"[^\W\d_]+", text, flags=re.UNICODE):
        if t.isalpha():
            out.append(t)
        else:
            out.extend("".join(g) for is_a, g in groupby(t, str.isalpha) if is_a)
    return out


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [(w, "1") for w in _letter_runs(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [(w, filename) for w in set(_letter_runs(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    docs = sorted(set(values))
    return f"{len(docs)} {','.join(docs)}"

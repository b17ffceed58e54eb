#!/usr/bin/env python
"""Offline, fully deterministic trainer for ``t_bpe_tokens``'s frozen
merge table (text.py: _BPE_MERGES).

Classic byte-pair encoding (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): pre-tokenize the sf0.01
fixture corpus into whitespace words, start every word as its character
sequence, and 64 times merge the most frequent adjacent token pair
(frequency weighted by word count). Ties break to the lexicographically
smallest pair and iteration runs over sorted dicts, so re-running this
script reproduces _BPE_MERGES bit-for-bit -- the same reproducibility
contract as tools/train_quality_classifier.py.

Two safety restrictions keep the ENGINE/ORACLE application dialect-safe
(the merge table is applied as a generated chain of SQL ``replace``
calls whose literals must mean the same bytes in Spark SQL and DuckDB):

* candidate pairs are restricted to purely alphanumeric tokens
  (``[A-Za-z0-9]+``) -- no quote/backslash escaping hazards ever reach a
  SQL literal;
* the corpus must be ASCII and free of the U+00A7 word separator the
  applier uses (asserted below; the fixture charset probe in tests
  guards the same invariant).

    PYTHONPATH=/root/repo python tools/train_bpe.py
"""

from __future__ import annotations

import collections
import re

import duckdb

_N_MERGES = 64
_SEPARATOR = "§"  # '§' -- applier word boundary, must not occur
_SAFE_TOKEN = re.compile(r"^[A-Za-z0-9]+$")


def word_counts(sf_dir: str) -> dict[str, int]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    counts: collections.Counter[str] = collections.Counter()
    for (text,) in rows:
        assert text.isascii(), "BPE corpus must be ASCII (charset probe)"
        assert _SEPARATOR not in text
        counts.update(text.split())
    return dict(sorted(counts.items()))


def merge_word(toks: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """One left-to-right merge pass -- the exact semantics a left-to-right
    non-overlapping string ``replace`` of ' a  b ' -> ' ab ' has on the
    DOUBLE-space token rendering (text.bpe_merge_chain_sql;
    property-tested in test_properties.py)."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return tuple(out)


def train(counts: dict[str, int], n_merges: int = _N_MERGES):
    vocab = {w: tuple(w) for w in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter[tuple[str, str]] = collections.Counter()
        for w, freq in counts.items():
            toks = vocab[w]
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += freq
        safe = {
            p: n
            for p, n in pairs.items()
            if _SAFE_TOKEN.match(p[0]) and _SAFE_TOKEN.match(p[1])
        }
        if not safe:
            break
        best_n = max(safe.values())
        best = min(p for p, n in safe.items() if n == best_n)
        merges.append(best)
        vocab = {w: merge_word(t, *best) for w, t in vocab.items()}
    return merges


def main() -> None:
    counts = word_counts("/root/testdata/sf0.01")
    merges = train(counts)
    print(f"# {len(merges)} merges trained on sf0.01 "
          f"({sum(counts.values())} words, {len(counts)} distinct)")
    print("_BPE_MERGES = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")


if __name__ == "__main__":
    main()

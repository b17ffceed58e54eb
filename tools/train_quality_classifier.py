#!/usr/bin/env python
"""Offline, fully deterministic trainer for ``t_quality_classifier``'s
frozen weights (text.py: _QC_WEIGHTS / _QC_BIAS).

The classifier is the bootstrap stage of a CCNet/Gopher-class curation
pipeline: distill the hand-written Gopher quality gate (t_gopher_filter's
five integer-exact rules) into a linear scorer over the hashing-trick
features the registry already computes (t_feature_hash's 64-bucket signed
counts -- the fasttext-style O(1)-state featurizer). The trained scorer
then prices every document with ONE codegen'd dot-product projection and
one hash-agg shuffle -- no per-doc rule evaluation, the shape a learned
fasttext/logistic scorer has in production.

Training is closed-form ridge regression (normal equations, lambda=10) on
the sf0.01 fixture with labels y = +/-1 from the Gopher keep decision --
no SGD, no seed, no iteration order: re-running this script reproduces
_QC_WEIGHTS bit-for-bit. Weights are frozen as INTEGER MICRO-UNITS
(round(w * 1e6)) so the engine- and oracle-side scores are exact integers.

Measured when frozen (round 9): train accuracy 0.906 at sf0.01 (keep rate
0.468), holdout accuracy 0.885 at sf0.1 (keep rate 0.451).

    PYTHONPATH=/root/repo python tools/train_quality_classifier.py
"""

from __future__ import annotations

import duckdb
import numpy as np

_STOPWORDS = ("the", "a", "and", "of", "is", "to", "in")  # text._STOPWORDS
_BUCKETS = 64
_LAMBDA = 10.0


def features_and_labels(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    # EXACT t_feature_hash fold: bucket/sign from md5 (reshape.md5_bucket).
    rows = con.execute(f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(w), 1, 8) AS BIGINT)
                        % {_BUCKETS} AS INT) AS b,
                   1 - 2 * (CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) % 2)
                       AS s
            FROM toks
        )
        SELECT doc_id, b, SUM(s) FROM hashed GROUP BY 1, 2
    """).fetchall()
    stop_sql = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"
    # EXACT t_gopher_filter keep decision (integer cross-multiplication).
    lab = con.execute(f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS tk,
                   len(regexp_replace(text, '[a-zA-Z0-9 \t\n\r\f]', '', 'g'))
                       AS n_sym
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(tk) BETWEEN 50 AND 100000
                     AND 3 * len(tk)
                         <= list_sum(list_transform(tk, x -> len(x)))
                     AND list_sum(list_transform(tk, x -> len(x)))
                         <= 10 * len(tk)
                     AND 10 * n_sym <= len(tk)
                     AND 5 * len(list_filter(tk,
                             x -> regexp_matches(x, '[a-zA-Z]')))
                         >= 4 * len(tk)
                     AND len(list_intersect(tk, {stop_sql})) >= 2
                THEN 1 ELSE -1 END
        FROM d
    """).fetchall()
    labels = dict(lab)
    ids = sorted(labels)
    idx = {d: i for i, d in enumerate(ids)}
    x = np.zeros((len(ids), _BUCKETS))
    for d, b, w in rows:
        x[idx[d], b] = w
    y = np.array([labels[d] for d in ids], dtype=float)
    return x, y


def main() -> None:
    x, y = features_and_labels("/root/testdata/sf0.01")
    xb = np.hstack([x, np.ones((len(y), 1))])
    w = np.linalg.solve(
        xb.T @ xb + _LAMBDA * np.eye(_BUCKETS + 1), xb.T @ y
    )
    wq = np.round(w * 1_000_000).astype(np.int64)
    print("train acc:", float((np.sign(xb @ wq) == y).mean()))
    x2, y2 = features_and_labels("/root/testdata/sf0.1")
    print(
        "holdout acc (sf0.1):",
        float((np.sign(x2 @ wq[:-1] + wq[-1]) == y2).mean()),
    )
    print("_QC_WEIGHTS =", wq[:-1].tolist())
    print("_QC_BIAS =", int(wq[-1]))


if __name__ == "__main__":
    main()

"""BM25F scoring — the one formula, used by the encode kernel (block-max
bounds), the WAND query kernel (exact scores) and the pure-Python oracle.

Whoosh ``scoring.BM25F`` semantics with its defaults, which the reference
never overrides (reference: src/index/build_bm25.py:7-13,
src/search/search_bm25.py:30-36):

    idf(t, f)   = ln(N / (df + 1)) + 1          (natural log; field-local df)
    w           = tf * field_boost
    score(t, f) = idf * w * (K1 + 1) / (w + K1 * (1 - B + B * dl_f / avgdl_f))

A document's score for a query = sum over query terms over fields where
the (term, field) matches.  K1 = 1.2, B = 0.75, title boost = 2.0.
"""

from __future__ import annotations

import math

import numpy as np


def idf(df: int, n_docs: int) -> float:
    return math.log(n_docs / (df + 1.0)) + 1.0


def term_scores(tf, dl, df, boost, k1, b, n_docs, avgdl):
    """Vectorized per-posting BM25F contribution. tf/dl are float arrays."""
    w = np.asarray(tf, dtype=np.float64) * boost
    denom = w + k1 * (1.0 - b + b * np.asarray(dl, dtype=np.float64) / avgdl)
    return idf(df, n_docs) * (w * (k1 + 1.0)) / denom

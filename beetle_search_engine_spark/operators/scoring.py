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

DOCUMENTED DIVERGENCE (field-length precision): Whoosh stores per-doc
field lengths BYTE-QUANTIZED (whoosh/util/numeric.py length_to_byte /
byte_to_length; the whoosh3 codec's doc_field_length returns the decoded
approximation), so real Whoosh scores use a bucketed dl for fields of
roughly 24+ tokens and can tie documents whose true lengths differ.
This engine scores with EXACT dl on both sides of its oracle pair (the
index kernel and the pure-Python/DuckDB oracles), which is strictly more
accurate and self-consistent, but means near-tie orderings can differ
from a real Whoosh instance on long fields.  Deliberately NOT replicated:
the exact quantization table would have to be transcribed from the
Whoosh source (unavailable in this sandbox) — a mis-transcribed table
silently corrupts every score, while exact dl is well-defined, and the
quantized dl can exceed block-max assumptions unless the encode-time
bounds are recomputed under the same table.  Revisit if bit-level score
parity against a live Whoosh becomes testable.
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

"""Dense text embedding (SURVEY M1 — reference: src/models/embed.py:25-67
encodes documents with a SentenceTransformer in batches of 32; the query
path re-encodes at search time, src/search/search_faiss.py:37-43).

Two paths:

* ``encoder_factory`` given — the real-model seam: an iterator-style
  mapInPandas with executor-side lazy model init (the reference's own
  singleton pattern, src/search/search_splade.py:22-29), Arrow-batched.
  ``encoder_factory() -> encode(texts: list[str]) -> list[list[float]]``.

* default — a deterministic hash-projection embedding (no model
  downloads in this sandbox): component i of a document = sum over its
  DISTINCT tokens of an md5-derived value in [-1, 1].  Pure Catalyst
  (one hash aggregation with ``dim`` sum columns — no Python, no row
  inflation) and bit-reproducible in ANSI SQL, which gives the
  embed -> ANN pipeline a DuckDB-checkable driver entry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _h64


def _component(term_col, i: int) -> F.Column:
    """md5-derived value in [-1, 1], identical in Spark and DuckDB."""
    return (_h64(term_col, f"e{i}") % 2001 - 1000) / 1000.0


def embed_texts(
    docs: DataFrame,
    dim: int = 16,
    encoder_factory=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, embedding: array<float>) — see module doc for the two paths."""
    if encoder_factory is not None:
        id_type = dict(docs.dtypes)[id_col]

        def kernel(batches):
            encode = encoder_factory()  # once per task: lazy model init
            for pdf in batches:
                texts = [t if isinstance(t, str) else "" for t in pdf[text_col]]
                vecs = encode(texts)
                yield pd.DataFrame({id_col: pdf[id_col], "embedding": [list(map(float, v)) for v in vecs]})

        return docs.select(id_col, text_col).mapInPandas(
            kernel, schema=f"{id_col} {id_type}, embedding array<float>"
        )

    from .textops import sql_tokens

    dt = sql_tokens(docs, text_col, id_col).distinct()
    sums = dt.groupBy(id_col).agg(
        *[F.sum(_component(F.col("term"), i)).alias(f"_e{i}") for i in range(dim)]
    )
    emb = F.array(*[F.round(F.col(f"_e{i}"), 6).cast("float") for i in range(dim)])
    return sums.select(F.col(id_col), emb.alias("embedding"))

"""BM25 as a pure DataFrame composition (no index, no Python).

This is the *oracle-comparable* scoring path: the same BM25 formula as the
engine (operators/scoring.py) over the reduced SQL tokenizer chain, built
entirely from Catalyst operators — tokenize/explode/agg joins + log
arithmetic + top-k.  It exists to (a) gate the engine's math against a
DuckDB oracle in CORRECTNESS_r{N}.json, and (b) serve ad-hoc scoring where
building a persistent index isn't worth it.  SURVEY A1-A3, J7-as-join, K1.

Also hosts the SPLADE-shaped weighted-posting scorer (SURVEY A4/A5,
reference: src/index/build_splade.py:40-55, src/search/search_splade.py:62-66):
same machinery with learned-ish weights instead of raw tf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textops import term_frequencies


def sql_bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    mode: str = "or",
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, score) top-k, score = sum over matching query terms of
    idf*w(K1+1)/(w+K1*(1-B+B*dl/avgdl)), idf = ln(N/(df+1))+1.

    dl derives from tf (sum of a doc's term frequencies == its token
    count) rather than a separate doc_lengths chain: every branch then
    shares the one tokenize+groupBy exchange subtree, which Spark's
    ReuseExchange rule evaluates once — the old independent dl chain
    re-ran the regex tokenizer over the whole corpus a second time.
    Zero-token docs (absent from tf) still count toward N and avgdl via
    the cheap column-pruned docs.count(); they can match no query term,
    so their missing dl rows never affect the join."""
    tf = term_frequencies(docs, text_col, id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # n_docs as an in-plan 1-row agg cross-joined through the broadcast
    # stats frame (round 7): the old ``docs.count()`` was a separate
    # driver-blocking job per query; computed as a column the doubles are
    # bit-identical (int/double division either way) and the whole query
    # is ONE job.  Zero-token docs still count toward N and avgdl via the
    # column-pruned count.
    stats = F.broadcast(
        dl.agg(F.sum("dl").alias("_dlsum"))
        .crossJoin(docs.agg(F.count(F.lit(1)).alias("n_docs")))
        .select(
            (F.col("_dlsum") / F.col("n_docs").cast("double")).alias("avgdl"),
            "n_docs",
        )
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q = (
        tf.filter(F.col("term").isin(query_terms))
        .join(F.broadcast(dfreq.filter(F.col("term").isin(query_terms))), "term")
        .join(dl, id_col)
        .crossJoin(stats)
    )
    idf = F.log(F.col("n_docs") / (F.col("df") + 1.0)) + 1.0
    w = F.col("tf").cast("double")
    contrib = idf * (w * (k1 + 1.0)) / (w + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    scored = q.groupBy(id_col).agg(
        F.sum(contrib).alias("_score"),
        F.count(F.lit(1)).alias("_nterms"),
    )
    if mode == "and":
        scored = scored.filter(F.col("_nterms") == len(set(query_terms)))
    return (
        scored.select(F.col(id_col), F.round(F.col("_score"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def splade_postings(
    docs: DataFrame,
    encoder_factory=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, term, weight) sparse expansion via an injected encoder.

    ``encoder_factory`` is the model-injection seam (same shape as the
    reranker's, plans/pipeline.py, and the multimodal decoder's): a
    zero-arg callable run ONCE PER TASK on the executor (lazy model
    singleton — the reference's own pattern, src/search/
    search_splade.py:22-29) returning ``encode(texts: list[str]) ->
    list[dict[str, float]]`` — one {term: weight} expansion per text.
    This is where a real SPLADE MLM head (reference:
    src/index/build_splade.py:14-31, log1p(relu(logits)) max-pool) plugs
    in; no operator code changes."""
    import pandas as pd

    def kernel(batches):
        encode = encoder_factory()
        for pdf in batches:
            texts = [t if isinstance(t, str) else "" for t in pdf[text_col]]
            maps = encode(texts)
            ids, terms, weights = [], [], []
            for i, m in zip(pdf[id_col], maps):
                for t, w in m.items():
                    ids.append(i)
                    terms.append(t)
                    weights.append(float(w))
            yield pd.DataFrame({id_col: ids, "term": terms, "weight": weights})

    id_type = dict(docs.dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, term string, weight double"
    )


def splade_like_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    encoder_factory=None,
) -> DataFrame:
    """Weighted-posting dot-product retrieval: doc weight =
    log1p(tf) * ln(1 + N/df) (a SPLADE-shaped sparse expansion stand-in —
    the sandbox has no model downloads), query weight = 1.  Score =
    sum of matched weights (SURVEY A5).  Pass ``encoder_factory`` to
    source weights from a real model via :func:`splade_postings`."""
    if encoder_factory is not None:
        weighted = splade_postings(docs, encoder_factory, text_col, id_col)
    else:
        tf = term_frequencies(docs, text_col, id_col)
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        stats = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
        weighted = (
            tf.join(F.broadcast(dfreq), "term")
            .crossJoin(stats)
            .select(
                F.col(id_col),
                "term",
                (F.log1p(F.col("tf")) * F.log(1.0 + F.col("n_docs") / F.col("df"))).alias("weight"),
            )
        )
    return (
        weighted.filter(F.col("term").isin(query_terms))
        .groupBy(id_col)
        .agg(F.round(F.sum("weight"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )

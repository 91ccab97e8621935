"""Model-injection seams: reranker (existing), multimodal decoder and
SPLADE encoder factories — a real model drops in without editing any
operator (the reference loads models inline: embed.py:25-67,
build_splade.py:14-31, reranker.py:8-34)."""

import numpy as np

from beetle_search_engine_spark.operators.multimodal import extract_features, generate_media
from beetle_search_engine_spark.plans.sqlbm25 import splade_like_topk, splade_postings


def test_decoder_factory_injection(spark):
    media = generate_media(spark, 20, seed=3)

    def factory():
        def decode(payload: bytes, dim: int) -> np.ndarray:
            return np.full(dim, float(len(payload)), dtype=np.float32)

        return decode

    rows = extract_features(media, dim=4, decoder_factory=factory).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["feature"] == [float(r["n_bytes"])] * 4  # injected decoder used


def test_embed_encoder_factory_injection(spark):
    from beetle_search_engine_spark.operators.embed import embed_texts

    docs = spark.createDataFrame([(1, "aa bb"), (2, "cc")], "doc_id long, text string")

    def factory():
        def encode(texts):
            return [[float(len(t))] * 4 for t in texts]

        return encode

    rows = {r["doc_id"]: r["embedding"] for r in embed_texts(docs, 4, factory).collect()}
    assert rows[1] == [5.0] * 4 and rows[2] == [2.0] * 4


def test_embed_default_deterministic(spark):
    from beetle_search_engine_spark.operators.embed import embed_texts

    docs = spark.createDataFrame([(1, "alpha beta"), (2, "alpha beta")], "doc_id long, text string")
    rows = [r["embedding"] for r in embed_texts(docs, 8).orderBy("doc_id").collect()]
    assert rows[0] == rows[1]  # same text -> same vector
    assert len(rows[0]) == 8 and any(abs(x) > 0 for x in rows[0])


def test_splade_encoder_factory_injection(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma delta")],
        "doc_id long, text string",
    )

    def factory():
        def encode(texts):
            # fake MLM expansion: each word -> weight 2.0, plus an
            # expansion term not in the text (what a real SPLADE does)
            return [{w: 2.0 for w in t.split()} | {"expanded": 0.5} for t in texts]

        return encode

    post = splade_postings(docs, factory).collect()
    assert {(r["doc_id"], r["term"]) for r in post} >= {(1, "alpha"), (1, "expanded")}

    top = splade_like_topk(docs, ["beta", "expanded"], 3, encoder_factory=factory).collect()
    scores = {r["doc_id"]: r["score"] for r in top}
    # docs 1,2 match beta (2.0) + expanded (0.5); doc 3 only expanded
    assert scores[1] == 2.5 and scores[2] == 2.5 and scores[3] == 0.5

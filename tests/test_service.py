"""HTTP API analog (§3.2): handler semantics + a real localhost round-trip."""

import json
import urllib.request

import pytest

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.query import BM25Index
from beetle_search_engine_spark.plans.service import SearchService, serve
from beetle_search_engine_spark.sources.corpus import generate_corpus

CFG = EngineConfig(index=IndexConfig(n_buckets=8, bucket_groups=1, chunk_docs=128, encode_partitions=4))


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("sidx"))
    corpus = generate_corpus(spark, 200, seed=61)
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=CFG)
    docs = corpus.selectExpr("doc_id", "content as text")
    return SearchService(spark, BM25Index(spark, idx_dir), docs)


def test_handle_search(svc):
    resp = svc.handle({"query": "transformer models", "top_k": 10, "rerank_k": 5})
    assert resp["status"] == 200
    assert resp["total_results"] == 5
    assert resp["results"][0]["rank"] == 1


def test_handle_empty_query(svc):
    assert svc.handle({"query": "  "})["status"] == 400


def test_handle_bad_method(svc):
    assert svc.handle({"query": "x", "search_method": "nope"})["status"] == 400


def test_handle_parser_grammar(svc):
    # raw query strings go through the MultifieldParser-analog grammar
    # (reference exposes Whoosh parser syntax straight to API users)
    resp = svc.handle({"query": "transformer OR models", "top_k": 10, "rerank_k": 5})
    assert resp["status"] == 200 and resp["total_results"] == 5
    # quoted phrase on a positionless index -> clean 400, not a crash
    resp = svc.handle({"query": '"transformer models"'})
    assert resp["status"] == 400
    assert "store_positions" in resp["error"]


def test_config(svc):
    c = svc.config()
    assert c["index"]["n_docs"] == 200
    assert c["bm25"]["k1"] == 1.2


def test_http_round_trip(svc):
    srv = serve(svc, port=8811)
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:8811/search",
            data=json.dumps({"query": "transformer models", "rerank_k": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert body["total_results"] == 3
        with urllib.request.urlopen("http://127.0.0.1:8811/config", timeout=30) as r:
            cfgb = json.loads(r.read())
        assert cfgb["index"]["n_docs"] == 200
        # probe: malformed JSON -> 400
        bad = urllib.request.Request("http://127.0.0.1:8811/search", data=b"{nope", method="POST")
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_handle_splade_method(svc):
    resp = svc.handle(
        {"query": "transformer models", "search_method": "splade", "rerank_k": 5}
    )
    assert resp["status"] == 200
    assert resp["method"] == "splade"
    assert resp["total_results"] == 5
    ranks = [r["rank"] for r in resp["results"]]
    assert ranks == sorted(ranks)


def test_handle_faiss_without_embeddings_is_400(svc):
    # "faiss" is a valid reference method but this service instance holds
    # no embedding table -> the pipeline's ValueError surfaces as a 400
    resp = svc.handle({"query": "q", "search_method": "faiss"})
    assert resp["status"] == 400


def test_handle_hybrid_without_embeddings_is_400(svc):
    resp = svc.handle({"query": "q", "search_method": "hybrid"})
    assert resp["status"] == 400
    assert "embeddings" in resp["error"]


@pytest.fixture(scope="module")
def svc_vec(spark, svc):
    # same index/docs, plus the deterministic doc embeddings -> the full
    # reference surface (hybrid is its default method, app.py:32)
    from beetle_search_engine_spark.operators.embed import embed_texts

    emb = embed_texts(svc.documents, dim=8)
    return SearchService(spark, svc.index, svc.documents, embeddings=emb)


def test_handle_hybrid_with_embeddings(svc_vec):
    resp = svc_vec.handle(
        {"query": "transformer models", "search_method": "hybrid", "rerank_k": 5}
    )
    assert resp["status"] == 200
    assert resp["total_results"] == 5
    ranks = [r["rank"] for r in resp["results"]]
    assert ranks == sorted(ranks)


def test_handle_faiss_with_embeddings_matches_direct_cosine(svc_vec):
    resp = svc_vec.handle(
        {"query": "transformer models", "search_method": "faiss", "top_k": 10, "rerank_k": 5}
    )
    assert resp["status"] == 200
    got = [(r["id"], r["score"]) for r in resp["results"]]
    # replay: embed the query with the same operator, exact cosine top-k
    from beetle_search_engine_spark.operators.ml import _cosine_topk

    qv = svc_vec.query_embedder("transformer models")
    want = [
        (r.doc_id, r.score)
        for r in _cosine_topk(svc_vec.embeddings, qv, 5, "doc_id", "embedding").collect()
    ]
    assert got == want


def test_handle_malformed_fields_are_400(svc):
    for req in (
        {"query": "x", "top_k": "abc"},
        {"query": "x", "rerank_k": "um"},
        {"query": 123, "top_k": 5},        # non-string query coerces fine
    ):
        resp = svc.handle(req)
        assert resp["status"] in (200, 400)
        assert "error" in resp or resp["total_results"] >= 0
    resp = svc.handle({"query": "x", "top_k": "abc"})
    assert resp["status"] == 400 and "top_k" not in resp.get("results", [])


def test_handle_explicit_zero_rerank_k(svc):
    """rerank_k=0 must return 0 results (the reference slices [:0]);
    an `or`-default would silently coerce it to 5 (round-6 review fix)."""
    resp = svc.handle({"query": "transformer models", "top_k": 10, "rerank_k": 0})
    assert resp["status"] == 200 and resp["total_results"] == 0
    resp2 = svc.handle({"query": "transformer models", "top_k": 0, "rerank_k": 0})
    assert resp2["status"] == 200 and resp2["total_results"] == 0


def test_http_malformed_content_length_is_400(svc):
    # a non-numeric Content-Length used to raise AttributeError (_json
    # did not exist) and reset the connection with no response; the
    # guard must answer a well-formed JSON 400 at the socket level
    import http.client

    srv = serve(svc, port=8813)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", 8813, timeout=30)
        conn.putrequest("POST", "/search")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 400 and "Content-Length" in body["error"]
        conn.close()
    finally:
        srv.shutdown()

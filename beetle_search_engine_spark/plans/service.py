"""Search service — the reference's HTTP API surface (§3.2; reference:
app.py:28-96, POST /search + GET /config) over the engine.

The handler is a pure function (request dict -> response dict) so it is
testable without sockets; ``serve`` wraps it in a stdlib ThreadingHTTPServer
for a real endpoint (the reference uses FastAPI — not available here, and
a framework adds nothing: the work happens in Spark).  The driver process
holds the cached BM25Index, matching the reference's long-lived app state.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

from .pipeline import search_and_rerank
from .query import BM25Index


class SearchService:
    """Request semantics mirror the reference's SearchRequest defaults
    (app.py:28-33): top_k=20, rerank_k=5, method='bm25' here (the
    reference defaults to hybrid; pass ``embeddings`` — a
    (doc_id, embedding) frame, e.g. ``embed_texts(documents)`` — to
    serve hybrid/faiss, and request them via ``search_method``).

    ``query_embedder`` encodes the raw query text at request time, the
    reference's search-time re-encode (search_faiss.py:37-43).  The
    default runs the SAME embed_texts operator on a one-row frame, so
    query and documents land in one vector space whichever path built
    the doc embeddings (dim is read from the stored table once)."""

    def __init__(
        self,
        spark: SparkSession,
        index: BM25Index,
        documents: DataFrame,
        embeddings: DataFrame | None = None,
        query_embedder=None,
    ):
        self.spark = spark
        self.index = index
        self.documents = documents
        self.embeddings = embeddings
        if embeddings is not None and query_embedder is None:
            # dim probe deferred to the first vector request (and cached):
            # the constructor must not run a Spark job, and an empty
            # embeddings frame should 400 at request time, not crash here
            self._dim = None

            def query_embedder(q: str):
                if self._dim is None:
                    row = self.embeddings.select("embedding").first()
                    if row is None:
                        raise ValueError("embeddings frame is empty")
                    self._dim = len(row[0])
                from ..operators.embed import embed_texts

                one = self.spark.createDataFrame([("q", q)], "doc_id string, text string")
                return [float(x) for x in embed_texts(one, dim=self._dim).first()["embedding"]]

        self.query_embedder = query_embedder

    def handle(self, request: dict) -> dict:
        # field coercion inside the 400 guard: a malformed value
        # ({"top_k": "abc"}, a non-string query) must be a JSON 400,
        # not an exception that kills the socket with no response
        try:
            query = str(request.get("query") or "").strip()
            # explicit 0 must pass through (the reference's pydantic
            # model does; `or` would coerce it to the default while the
            # string "0" slipped past — round-6 review finding)
            _tk = request.get("top_k")
            top_k = 20 if _tk is None else int(_tk)
            _rk = request.get("rerank_k")
            rerank_k = 5 if _rk is None else int(_rk)
            method = str(request.get("search_method", "bm25"))
            rerank = bool(request.get("reranker_enabled", False))
        except (TypeError, ValueError) as e:
            return {"error": f"bad request field: {e}", "status": 400}
        if not query:
            return {"error": "query must not be empty", "status": 400}
        try:
            qvec = None
            if method in ("hybrid", "faiss", "knn") and self.embeddings is not None:
                qvec = self.query_embedder(query)
            rows = search_and_rerank(
                self.spark, self.index, self.documents, query,
                method=method, top_k=top_k, rerank_k=rerank_k, rerank=rerank,
                embeddings=self.embeddings, query_vec=qvec,
            ).collect()
        except ValueError as e:
            return {"error": str(e), "status": 400}
        except Exception as e:  # reference returns 500 with str(e) (app.py:80-81)
            return {"error": str(e), "status": 500}
        return {
            "status": 200,
            "query": query,
            "results": [
                {"id": r["doc_id"], "score": r["score"], "rank": r["rank"]} for r in rows
            ],
            "total_results": len(rows),
            "method": method,
            "reranker": rerank,
        }

    def config(self) -> dict:
        """GET /config analog (app.py:84-96)."""
        s = self.index.stats
        return {
            "status": 200,
            "bm25": {"k1": s["k1"], "b": s["b"], "field_boosts": s["field_boosts"]},
            "index": {
                "n_docs": s["n_docs"],
                "vocab_size": s.get("vocab_size"),
                "n_buckets": s["n_buckets"],
                "epochs": sorted(s.get("epochs", {}), key=int),
            },
        }


def serve(service: SearchService, host: str = "127.0.0.1", port: int = 8808):
    """Start a real HTTP endpoint (daemon thread); returns the server."""

    class Handler(BaseHTTPRequestHandler):
        def _send(self, payload: dict):
            status = payload.pop("status", 200)
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/search":
                return self._send({"error": "not found", "status": 404})
            try:
                # a non-numeric Content-Length must get the same JSON
                # 400 as any other malformed input (a bare int() crashed
                # the handler with a connection reset), and a negative
                # value must not turn rfile.read into read-until-EOF
                n = max(0, int(self.headers.get("Content-Length", "0")))
            except ValueError:
                # Handler has no _json helper — the old call here raised
                # AttributeError and reset the connection, the exact
                # failure it claimed to fix (round-7 ADVICE fix)
                return self._send({"error": "invalid Content-Length", "status": 400})
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._send({"error": "invalid JSON body", "status": 400})
            self._send(service.handle(req))

        def do_GET(self):
            if self.path == "/config":
                return self._send(service.config())
            self._send({"error": "not found", "status": 404})

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv

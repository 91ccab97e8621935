from .query import BM25Index, search_bm25  # noqa: F401

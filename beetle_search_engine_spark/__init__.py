"""beetle_search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the query/data-processing capabilities of
akshitmanocha/Beetle-Search-Engine (reference at /root/reference, read-only),
re-expressed Spark-first: posting-list construction via salted term-hash
shuffle, delta+varint block compression with block-max score bounds,
block-max WAND top-k query kernel, resumable per-bucket-group builds,
plus the search sidecars the reference exposes (RRF fusion, brute-force
KNN, weighted-posting a.k.a. SPLADE-shaped search, heuristic labeling)
and large-scale pipeline operators (dedup, quality scoring, fingerprints).

Layout
------
functions/  analyzer chain (Whoosh-compatible tokenize/stop/stem), scalar fns
sources/    corpus generator (Iceberg-shaped source-code table), testdata IO
operators/  index build, varint/block codecs, WAND kernel, dedup, text stats
plans/      query lifecycle (search_bm25 / knn / hybrid entry points)
streaming/  incremental index refresh via foreachBatch
"""

__version__ = "0.1.0"

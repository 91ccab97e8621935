"""One-shot CLI — the engine analog of the reference's ``python main.py
"<query>"`` entry point (reference: main.py:95-123: argparse query ->
params.yaml search config -> search_and_rerank -> printed ranked list).

    python -m beetle_search_engine_spark "transformer models" \
        --index /tmp/idx [--docs /path/docs.parquet] \
        [--top-k 10] [--rerank-k 5] [--method bm25] [--rerank]

Defaults mirror the reference's params.yaml (top_k=10, rerank_k per
params.yaml:22-23); ``--rerank`` enables the reranker stage exactly like
``search.reranker`` there.  Without ``--docs`` the command prints the raw
retrieval (doc_id, score, rank); with it, the full fetch -> rerank
pipeline runs and the ranked doc ids print with their scores.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="beetle_search_engine_spark", description="Perform a search with reranking."
    )
    ap.add_argument("query", type=str, help="The search query (parser grammar: "
                    'bare terms AND, OR, field:term, NOT term, "quoted phrase").')
    ap.add_argument("--index", required=True, help="index directory (build_index output)")
    ap.add_argument("--docs", default=None, help="documents parquet (doc_id, text) for fetch+rerank")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--rerank-k", type=int, default=5)
    ap.add_argument("--method", default="bm25", choices=["bm25"])
    ap.add_argument("--rerank", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from .plans.pipeline import search_and_rerank
    from .plans.query import BM25Index
    from .sources.session import get_spark

    spark = get_spark("beetle-cli", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    index = BM25Index(spark, args.index)

    if args.docs:
        from pyspark.sql import functions as F

        docs = spark.read.parquet(args.docs).select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        rows = search_and_rerank(
            spark, index, docs, args.query, args.method,
            args.top_k, args.rerank_k, rerank=args.rerank,
        ).collect()
    else:
        if args.rerank:
            # no --docs means no text to rerank against — say so rather
            # than printing a '(Reranked)' header over plain BM25 scores
            print("--rerank needs --docs (no document text to score); ignoring")
        rows = index.search(args.query, args.top_k, mode="parse").collect()

    print(f"\n--- Top {len(rows)} results for '{args.query}' ---")
    if args.rerank and args.docs:
        print("(Reranked)")
    for r in rows:
        print(f"{r['rank']}. doc_id: {r['doc_id']}")
        print(f"   Score: {r['score']:.4f}")
        print("-" * 20)
    spark.stop()


if __name__ == "__main__":
    main()

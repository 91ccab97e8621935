"""Index-build throughput at a given parallelism — the scaling-efficiency
worker (BASELINE.json north_rule: >=0.8 between N and 4N; sandbox stand-in
for N vs 4N executor clusters is local[N] vs local[4N] on the same input).

Run standalone:  python tools/bench_build.py --cores 8 --docs 40000
Prints one JSON line {cores, docs, build_s, docs_per_sec, postings}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from beetle_search_engine_spark.config import EngineConfig, IndexConfig  # noqa: E402
from beetle_search_engine_spark.operators.build import build_index  # noqa: E402
from beetle_search_engine_spark.plans.query import BM25Index  # noqa: E402
from beetle_search_engine_spark.sources.corpus import generate_corpus  # noqa: E402
from beetle_search_engine_spark.sources.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--queries", type=int, default=0, help="also time N engine queries")
    args = ap.parse_args()

    idx_dir = f"/tmp/bench_idx_c{args.cores}_d{args.docs}"
    shutil.rmtree(idx_dir, ignore_errors=True)

    spark = get_spark(f"bench-build-{args.cores}", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(
        index=IndexConfig(
            n_buckets=64,
            bucket_groups=1,
            chunk_docs=1 << 14,
            encode_partitions=args.cores * 2,
        )
    )
    corpus = generate_corpus(spark, args.docs, seed=args.seed)
    corpus.persist().count()  # materialize input outside the timed window

    t0 = time.time()
    m = build_index(
        spark, corpus, idx_dir, fields={"title": "path", "body": "content"}, cfg=cfg, resume=False
    )
    build_s = time.time() - t0

    out = {
        "cores": args.cores,
        "docs": args.docs,
        "build_s": round(build_s, 3),
        "docs_per_sec": round(args.docs / build_s, 1),
        "postings": m["postings"],
        "postings_per_sec": round(m["postings"] / build_s, 1),
        "compressed_bytes": m["compressed_bytes"],
    }
    if args.queries:
        idx = BM25Index(spark, idx_dir)
        qs = ["transformer models", "spark partition shuffle", "def class return value", "search rank score"]
        tq = time.time()
        for i in range(args.queries):
            idx.search(qs[i % len(qs)], top_k=10, mode="or").collect()
        out["query_avg_s"] = round((time.time() - tq) / args.queries, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

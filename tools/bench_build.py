"""Index-build throughput at a given parallelism — the scaling-efficiency
worker (BASELINE.json north_rule: >=0.8 between N and 4N; sandbox stand-in
for N vs 4N executor clusters is local[N] vs local[4N] on the same input).

Run standalone:  python tools/bench_build.py --cores 8 --docs 40000
Prints one JSON line {cores, docs, build_s, docs_per_sec, postings}.
"""

from __future__ import annotations

import argparse
import json
import os
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
    ap.add_argument("--tokenizer", default="auto", help="auto|python|jvm — pin jvm to measure the at-scale configuration")
    ap.add_argument("--master", default=None, help="e.g. spark://127.0.0.1:7077 for the local standalone cluster")
    args = ap.parse_args()

    idx_dir = f"/tmp/bench_idx_c{args.cores}_d{args.docs}"
    shutil.rmtree(idx_dir, ignore_errors=True)

    # The north rule's criterion is "the SAME job at two cluster sizes":
    # on a real cluster the job's partitioning (shuffle partitions,
    # encode partitions) is fixed — sized for the larger cluster — and
    # only the executor count varies.  So every core count here runs the
    # IDENTICAL logical plan (fixed 8-way shuffle/encode layout, 2
    # tasks/core at the largest measured size — A/B'd faster than 16-way
    # at every core count on this VM); cores is the only variable.
    # (Earlier rounds scaled the layout with cores, i.e. compared two
    # different jobs.)
    layout_parts = int(os.environ.get("BEETLE_BENCH_PARTS", "8"))
    spark = get_spark(
        f"bench-build-{args.cores}", cores=args.cores, shuffle_partitions=layout_parts,
        master=args.master,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # n_buckets must comfortably exceed encode parallelism: the
    # bucket-major shuffle key has n_buckets(+salt) distinct values, so
    # too-few buckets turns reducers into balls-in-bins stragglers.
    cfg = EngineConfig(
        tokenizer=args.tokenizer,
        index=IndexConfig(
            n_buckets=512,
            bucket_groups=1,
            chunk_docs=1 << 14,
            encode_partitions=layout_parts,
        )
    )
    # materialize input (parquet) outside the timed window, with a FIXED
    # deterministic file layout (hash-partitioned on doc_id, 2x the job's
    # partition count so every file is far below the split size at any
    # measured core count) — the same input bytes for every run, and
    # small enough files that zero-copy staging engages
    src = f"/tmp/bench_corpus_{args.docs}_{args.seed}_p{layout_parts * 2}"
    if not os.path.exists(src):
        from pyspark.sql import functions as SF

        (
            generate_corpus(spark, args.docs, seed=args.seed)
            .repartition(layout_parts * 2, SF.col("doc_id"))
            .write.mode("overwrite").parquet(src)
        )
    corpus = spark.read.parquet(src)

    t0 = time.time()
    m = build_index(
        spark, corpus, idx_dir, fields={"title": "path", "body": "content"}, cfg=cfg,
        resume=False, stage_partitions=layout_parts, prestaged=src,
    )
    build_s = time.time() - t0

    out = {
        "cores": args.cores,
        "master": args.master or "local",
        "tokenizer": args.tokenizer,
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

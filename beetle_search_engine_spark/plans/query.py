"""BM25 query lifecycle (SURVEY.md §3.1 rebuilt Spark-first).

    query string
      -> analyze_query (driver-side, same T1-T4 chain as indexing)
      -> bucket ids for the query's terms (tiny JVM job: pmod(xxhash64))
      -> bucket-pruned, term-filtered scan of the posting parquet
         (partition pruning on bucket dirs + row-group pushdown on term)
      -> groupBy(chunk).applyInPandas(block-max WAND kernel)  [bounded heap k]
      -> global TakeOrderedAndProject (score desc, docnum asc) limit k
      -> broadcast join with the docids dimension for display ids

Node boundaries appear exactly twice, as in the survey's plan: the term
broadcast into the kernel closure and the final top-k merge.  The
reference's equivalent path is search_bm25.py:27-39 (Whoosh searcher).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.analyzer import analyze_query
from ..functions.xxhash import pmod_bucket
from ..operators.wand import make_wand_kernel

RESULT_SCHEMA = "doc_id string, score double, rank int"


class BM25Index:
    """Handle over a built index directory; caches stats + scan DataFrames
    (the reference reopens its index from disk on every query,
    search_bm25.py:27 — here the driver holds the cached plan)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(f"{index_dir}/stats.json") as f:
            self.stats = json.load(f)
        self.postings = spark.read.parquet(f"{index_dir}/postings")
        self.docids = spark.read.parquet(f"{index_dir}/docids")

    def _buckets_for(self, terms: list[str]) -> dict[str, int]:
        # driver-local pure-Python XXH64, parity-tested vs Spark's
        # xxhash64 — no per-query Spark job just to learn bucket ids
        n_buckets = self.stats["n_buckets"]
        return {t: pmod_bucket(t, n_buckets) for t in terms}

    def empty_result(self) -> DataFrame:
        return self.spark.createDataFrame([], RESULT_SCHEMA)

    def refresh_stats(self) -> None:
        """Re-read stats.json (after an incremental append_epoch)."""
        with open(f"{self.index_dir}/stats.json") as f:
            self.stats = json.load(f)
        self.postings = self.spark.read.parquet(f"{self.index_dir}/postings")
        self.docids = self.spark.read.parquet(f"{self.index_dir}/docids")

    def search(self, query: str, top_k: int = 10, mode: str = "and") -> DataFrame:
        """Top-k BM25F.  mode='and' == Whoosh's default conjunctive parser
        semantics (§3.1); mode='or' == disjunctive block-max WAND."""
        terms = analyze_query(query)
        if not terms:
            return self.empty_result()
        buckets = self._buckets_for(terms)
        scan = self.postings.filter(
            F.col("bucket").isin(sorted(set(buckets.values()))) & F.col("term").isin(terms)
        )
        df_override = None
        if len(self.stats.get("epochs", {"0": 0})) > 1:
            # multi-epoch index: true df = sum of per-epoch dfs; one tiny
            # metadata aggregation over the already-pruned scan
            rows = (
                scan.groupBy("field", "term", "epoch")
                .agg(F.first("df").alias("df"))
                .groupBy("field", "term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            df_override = {(r["field"], r["term"]): int(r["df"]) for r in rows}
        kernel = make_wand_kernel(terms, self.stats, top_k, mode, df_override)
        scored = scan.groupBy("chunk").applyInPandas(kernel, "docnum long, score double")
        top = scored.orderBy(F.desc("score"), F.asc("docnum")).limit(top_k)
        res = self.docids.join(F.broadcast(top), "docnum", "inner")
        w = Window.orderBy(F.desc("score"), F.asc("docnum"))
        return res.withColumn("rank", F.row_number().over(w)).select("doc_id", "score", "rank")


def search_bm25(spark: SparkSession, index_dir: str, query: str, top_k: int = 10, mode: str = "and") -> DataFrame:
    return BM25Index(spark, index_dir).search(query, top_k, mode)

"""Source-format abstraction: the engine builds identical indexes from
parquet, JSON-lines and ORC corpora (EngineConfig.source_format exists
for Iceberg at deploy time; the reader surface is format-agnostic —
reference stores JSON arrays + CSVs, SURVEY S7-S10)."""

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.query import BM25Index
from beetle_search_engine_spark.sources.corpus import generate_corpus

CFG = EngineConfig(
    index=IndexConfig(n_buckets=4, bucket_groups=1, chunk_docs=128, encode_partitions=4)
)


def _top(spark, idx_dir, q="transformer models"):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in BM25Index(spark, idx_dir).search(q, 10, "or").collect()
    ]


def test_same_index_from_json_and_orc(spark, tmp_path):
    corpus = generate_corpus(spark, 300, seed=17)
    base = str(tmp_path)
    corpus.write.mode("overwrite").parquet(f"{base}/c.parquet")
    corpus.write.mode("overwrite").json(f"{base}/c.json")
    corpus.write.mode("overwrite").orc(f"{base}/c.orc")

    tops = {}
    for fmt, path in (("parquet", f"{base}/c.parquet"), ("json", f"{base}/c.json"), ("orc", f"{base}/c.orc")):
        src = spark.read.format(fmt).load(path)
        if fmt == "json":  # JSON reads need the id column type pinned
            src = src.select("repo", "path", "commit", "lang", "content", "doc_id", "content_sha")
        idx_dir = f"{base}/idx_{fmt}"
        m = build_index(spark, src, idx_dir, fields={"body": "content"}, cfg=CFG, resume=False)
        assert m["n_docs"] == 300
        tops[fmt] = _top(spark, idx_dir)
    assert tops["parquet"] == tops["json"] == tops["orc"]
    assert len(tops["parquet"]) == 10

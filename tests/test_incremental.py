"""Incremental epochs: build(A) + append(B) must score exactly like a
from-scratch build over A∪B (same formula, same true stats), for both
query modes — this is the multi-epoch df-override + bound-rescale path.
Plus a Structured Streaming foreachBatch smoke (each micro-batch -> epoch).
"""

import pytest
from pyspark.sql import functions as F

from beetle_search_engine_spark.config import BM25Params, EngineConfig, IndexConfig
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.query import BM25Index
from beetle_search_engine_spark.sources.corpus import generate_corpus
from beetle_search_engine_spark.streaming.incremental import append_epoch, stream_refresh

from .oracle import assert_rank_identical

FIELDS = {"title": "path", "body": "content"}
CFG = EngineConfig(
    bm25=BM25Params(),
    index=IndexConfig(
        n_buckets=8, block_size=16, blocks_per_row=4, chunk_docs=64,
        hot_df_threshold=60, hot_salts=4, encode_partitions=8, bucket_groups=1,
    ),
)
QUERIES = ["transformer models", "spark partition shuffle", "query", "def class return value"]


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("full"))
    inc_dir = str(tmp_path_factory.mktemp("inc"))
    a = generate_corpus(spark, 200, seed=21)
    b = generate_corpus(spark, 120, seed=22).withColumn(
        "path", F.concat(F.lit("b/"), F.col("path"))
    ).withColumn("doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256))
    both = a.unionByName(b)
    build_index(spark, both, full_dir, fields=FIELDS, cfg=CFG)
    build_index(spark, a, inc_dir, fields=FIELDS, cfg=CFG)
    info = append_epoch(spark, inc_dir, b, fields=FIELDS, cfg=CFG)
    assert info["epoch"] == 1 and info["n_total"] == 320
    return full_dir, inc_dir


@pytest.mark.parametrize("mode", ["and", "or"])
@pytest.mark.parametrize("local", [True, False], ids=["local", "distributed"])
def test_epoch_append_matches_full_rebuild(spark, indexes, mode, local):
    full_dir, inc_dir = indexes
    full = BM25Index(spark, full_dir)
    inc = BM25Index(spark, inc_dir)
    assert len(inc.stats["epochs"]) == 2
    for q in QUERIES:
        want = [(r["doc_id"], r["score"]) for r in full.search(q, 10, mode, prefer_local=local).collect()]
        got = [(r["doc_id"], r["score"]) for r in inc.search(q, 10, mode, prefer_local=local).collect()]
        assert_rank_identical(got, want, rel_tol=1e-9)


def test_stream_refresh_foreachbatch(spark, indexes, tmp_path):
    _, inc_dir = indexes
    # stream a third batch of docs from a parquet dir -> epoch 2
    src = str(tmp_path / "stream_src")
    c = generate_corpus(spark, 50, seed=23).withColumn(
        "path", F.concat(F.lit("c/"), F.col("path"))
    ).withColumn("doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256))
    c.write.parquet(src)
    stream = spark.readStream.schema(c.schema).parquet(src)
    q = stream_refresh(
        stream, inc_dir, fields=FIELDS, cfg=CFG,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    idx = BM25Index(spark, inc_dir)
    assert idx.stats["n_docs"] == 370
    assert len(idx.stats["epochs"]) == 3
    res = idx.search("transformer models", 5, "or")
    assert res.count() == 5

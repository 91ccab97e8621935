"""Document deletion (tombstones): Lucene/Whoosh semantics — deleted
docs vanish from results immediately, corpus stats stay stale until a
full rebuild (which clears the tombstones).  Driver-gated end-to-end via
the `engine_delete` oracle entry; these tests pin the API surface and
the edge semantics on a controlled corpus."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.query import BM25Index

CFG = EngineConfig(
    analyzer="sql",
    index=IndexConfig(n_buckets=4, bucket_groups=1, chunk_docs=8, encode_partitions=4),
)


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("delidx") / "idx")
    rows = []
    # docs 0..19 contain 'alpha'; even ones also 'beta'; 3 has 'gamma'
    for i in range(20):
        toks = ["alpha", f"filler{i}"]
        if i % 2 == 0:
            toks.append("beta")
        if i == 3:
            toks.append("gamma")
        rows.append((f"d{i}", " ".join(toks * (1 + i % 3))))
    corpus = spark.createDataFrame(rows, "doc_id string, content string")
    build_index(spark, corpus, d, fields={"body": "content"}, cfg=CFG)
    return d


def _fresh(spark, idx_dir):
    shutil.rmtree(f"{idx_dir}/tombstones", ignore_errors=True)
    return BM25Index(spark, idx_dir)


@pytest.mark.parametrize("prefer_local", [True, False])
def test_deleted_docs_vanish_and_survivors_keep_scores(spark, idx_dir, prefer_local):
    idx = _fresh(spark, idx_dir)
    before = {
        r.doc_id: r.score
        for r in idx.search("alpha", 20, "or", prefer_local=prefer_local).collect()
    }
    assert "d3" in before and "d7" in before
    assert idx.delete_docs(["d3", "d7"]) == 2
    after = {
        r.doc_id: r.score
        for r in idx.search("alpha", 20, "or", prefer_local=prefer_local).collect()
    }
    assert "d3" not in after and "d7" not in after
    # stale-stats semantics: every survivor scores EXACTLY as before
    for doc, s in after.items():
        assert s == before[doc]


def test_deletion_displaces_into_topk(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    top3 = [r.doc_id for r in idx.search("alpha", 3, "or").collect()]
    assert idx.delete_docs([top3[0]]) == 1
    new3 = [r.doc_id for r in idx.search("alpha", 3, "or").collect()]
    assert top3[0] not in new3
    assert len(new3) == 3  # the next-ranked doc refilled the slot
    assert new3[:2] == top3[1:]


def test_delete_all_matches_empties_result(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    assert idx.delete_docs(["d3"]) == 1
    assert idx.search("gamma", 10, "or").count() == 0


def test_delete_unknown_ids_is_noop(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    assert idx.delete_docs(["nope", "missing"]) == 0
    assert idx.deleted is None


def test_delete_via_dataframe_and_persistence(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    ids = spark.createDataFrame([("d0",), ("d2",)], "doc_id string")
    assert idx.delete_docs(ids) == 2
    # a NEW handle over the same dir sees the tombstones (persisted)
    reopened = BM25Index(spark, idx_dir)
    got = {r.doc_id for r in reopened.search("beta", 20, "or").collect()}
    assert "d0" not in got and "d2" not in got
    assert "d4" in got


def test_deletes_accumulate_across_calls(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    idx.delete_docs(["d1"])
    idx.delete_docs(["d5"])
    got = {r.doc_id for r in idx.search("alpha", 20, "or").collect()}
    assert not {"d1", "d5"} & got


def test_deletion_composes_with_not_and_mode_and(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    idx.delete_docs(["d4"])
    got = {r.doc_id for r in idx.search("alpha beta", 20, "and").collect()}
    assert "d4" not in got and "d6" in got
    got = {r.doc_id for r in idx.search("alpha NOT gamma", 20, "parse").collect()}
    assert "d3" not in got and "d4" not in got


def test_delete_composes_with_incremental_append(spark, tmp_path):
    """Tombstones refer to docnums; an epoch append extends the docnum
    range without renumbering, so earlier deletions stay valid and new
    epoch docs are searchable alongside them."""
    from beetle_search_engine_spark.streaming.incremental import append_epoch

    d = str(tmp_path / "incdel")
    base = spark.createDataFrame(
        [(f"d{i}", f"alpha filler{i}") for i in range(8)], "doc_id string, content string"
    )
    build_index(spark, base, d, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, d)
    assert idx.delete_docs(["d1", "d2"]) == 2
    extra = spark.createDataFrame(
        [(f"e{i}", f"alpha extra{i}") for i in range(4)], "doc_id string, content string"
    )
    append_epoch(spark, d, extra, fields={"body": "content"}, cfg=CFG)
    idx.refresh_stats()  # re-reads stats AND tombstones
    got = {r.doc_id for r in idx.search("alpha", 20, "or").collect()}
    assert not {"d1", "d2"} & got
    assert {"e0", "e1", "e2", "e3"} <= got
    assert len(got) == 10  # 8 - 2 deleted + 4 appended
    # deleting an epoch doc works too (docnum resolution spans epochs)
    assert idx.delete_docs(["e0"]) == 1
    got = {r.doc_id for r in idx.search("alpha", 20, "or").collect()}
    assert "e0" not in got and len(got) == 9


def test_full_rebuild_clears_tombstones(spark, idx_dir):
    idx = _fresh(spark, idx_dir)
    idx.delete_docs(["d3"])
    assert idx.deleted is not None
    # force a full rebuild (resume=False path rebuilds regardless)
    corpus = spark.createDataFrame(
        [(f"d{i}", f"alpha filler{i}") for i in range(10)], "doc_id string, content string"
    )
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=CFG, resume=False)
    rebuilt = BM25Index(spark, idx_dir)
    assert rebuilt.deleted is None
    assert "d3" in {r.doc_id for r in rebuilt.search("alpha", 20, "or").collect()}


def test_repeated_delete_is_idempotent(spark, idx_dir):
    """ADVICE r04: re-deleting tombstoned ids reports 0 NEW deletions and
    appends no duplicate tombstone rows."""
    idx = _fresh(spark, idx_dir)
    assert idx.delete_docs(["d1", "d2"]) == 2
    assert idx.delete_docs(["d1", "d2"]) == 0
    assert idx.delete_docs(["d2", "d5"]) == 1  # only d5 is new
    tomb = spark.read.parquet(f"{idx_dir}/tombstones")
    assert tomb.count() == 3 == tomb.distinct().count()


def test_every_respects_tombstones(spark, idx_dir):
    """'*' (Whoosh EveryPlugin) matches exactly the LIVE docs: tombstoned
    docs vanish, exclusions compose, every score is Every's constant 1.0,
    and the top-k cut is the lexicographically-first k live ids."""
    idx = _fresh(spark, idx_dir)
    n = idx.stats["n_docs"]
    res = idx.search("*", 50, "parse").collect()
    assert len(res) == n
    assert all(r.score == 1.0 for r in res)
    ids = [r.doc_id for r in res]
    assert ids == sorted(ids)
    idx.delete_docs([ids[0], ids[3]])
    after = [r.doc_id for r in idx.search("*", 50, "parse").collect()]
    assert set(after) == set(ids) - {ids[0], ids[3]} and after == sorted(after)
    # '* NOT x' == the complement of x's match set, among live docs
    ex = {r.doc_id for r in idx.search("* NOT alpha", 50, "parse").collect()}
    has = {r.doc_id for r in idx.search("alpha", 50, "or").collect()}
    assert ex == set(after) - has
    # top-k cut
    top3 = [r.doc_id for r in idx.search("*", 3, "parse").collect()]
    assert top3 == after[:3]

"""optimize_index: physical merge (Lucene forceMerge + expungeDeletes).
Driver-gated via the engine_optimize oracle entry; these tests pin the
strongest invariant directly — a deleted-then-optimized index answers
queries EXACTLY like a from-scratch build over the filtered corpus —
plus epoch collapse, positions survival, and tombstone clearing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.operators.build import build_index, optimize_index
from beetle_search_engine_spark.plans.query import BM25Index

CFG = EngineConfig(
    analyzer="sql",
    index=IndexConfig(
        n_buckets=4, bucket_groups=2, chunk_docs=8, encode_partitions=4,
        hot_df_threshold=10,
    ),
)
POS_CFG = EngineConfig(
    analyzer="sql",
    index=IndexConfig(
        n_buckets=4, bucket_groups=1, chunk_docs=8, encode_partitions=4,
        store_positions=True,
    ),
)


def _corpus(spark, n=24):
    rows = []
    for i in range(n):
        toks = ["alpha", f"filler{i}"]
        if i % 2 == 0:
            toks.append("beta gamma")  # adjacent for phrase tests
        rows.append((f"d{i}", " ".join(toks * (1 + i % 3))))
    return spark.createDataFrame(rows, "doc_id string, content string")


def _res(idx, q, mode="or", k=20):
    return [(r.doc_id, round(r.score, 9)) for r in idx.search(q, k, mode).collect()]


def test_optimize_equals_rebuild_on_filtered_corpus(spark, tmp_path):
    """THE invariant: after delete+optimize, every query is
    score-identical to a fresh build over the corpus minus the deleted
    docs (fresh stats, fresh bounds, fresh df)."""
    corpus = _corpus(spark)
    d1 = str(tmp_path / "opt")
    build_index(spark, corpus, d1, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, d1)
    dead = ["d0", "d3", "d7", "d10"]
    assert idx.delete_docs(dead) == 4
    m = optimize_index(spark, d1)
    assert m["deleted_purged"] == 4 and m["n_docs"] == 20
    idx = BM25Index(spark, d1)

    d2 = str(tmp_path / "ref")
    build_index(
        spark, corpus.filter(~F.col("doc_id").isin(dead)), d2,
        fields={"body": "content"}, cfg=CFG,
    )
    ref = BM25Index(spark, d2)
    for q, mode in [("alpha", "or"), ("alpha beta", "and"), ("beta OR gamma", "parse")]:
        assert _res(idx, q, mode) == _res(ref, q, mode)


def test_optimize_clears_tombstones_and_refreshes_stats(spark, tmp_path):
    d = str(tmp_path / "opt2")
    build_index(spark, _corpus(spark), d, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, d)
    idx.delete_docs(["d1", "d2"])
    old_n = idx.stats["n_docs"]
    optimize_index(spark, d)
    idx = BM25Index(spark, d)
    assert idx.deleted is None  # tombstone dir gone
    assert idx.stats["n_docs"] == old_n - 2  # stats caught up
    assert idx.stats["optimize_count"] == 1
    assert list(idx.stats["epochs"]) == ["0"]
    got = {r.doc_id for r in idx.search("alpha", 30, "or").collect()}
    assert not {"d1", "d2"} & got and len(got) == 22


def test_optimize_merges_epochs_without_deletions(spark, tmp_path):
    """forceMerge alone: multi-epoch index collapses to one epoch with
    identical results (df summing / bound rescaling no longer needed)."""
    from beetle_search_engine_spark.streaming.incremental import append_epoch

    corpus = _corpus(spark)
    d = str(tmp_path / "opt3")
    build_index(
        spark, corpus.filter(F.col("doc_id").cast("string") < "d2"), d,
        fields={"body": "content"}, cfg=CFG,
    )
    first = corpus.filter(F.col("doc_id").cast("string") < "d2")
    rest = corpus.join(first.select("doc_id"), "doc_id", "left_anti")
    append_epoch(spark, d, rest, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, d)
    before = _res(idx, "alpha")
    assert len(idx.stats["epochs"]) == 2
    optimize_index(spark, d)
    idx = BM25Index(spark, d)
    assert list(idx.stats["epochs"]) == ["0"]
    assert _res(idx, "alpha") == before


def test_optimize_preserves_positions(spark, tmp_path):
    d = str(tmp_path / "opt4")
    build_index(spark, _corpus(spark), d, fields={"body": "content"}, cfg=POS_CFG)
    idx = BM25Index(spark, d)
    before = {r.doc_id for r in idx.search('"beta gamma"', 30, "parse").collect()}
    assert before  # phrase matches exist pre-merge
    idx.delete_docs(["d2"])
    optimize_index(spark, d)
    idx = BM25Index(spark, d)
    after = {r.doc_id for r in idx.search('"beta gamma"', 30, "parse").collect()}
    assert after == before - {"d2"}


def test_optimize_empty_result_guard(spark, tmp_path):
    d = str(tmp_path / "opt5")
    corpus = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "alpha gamma")], "doc_id string, content string"
    )
    build_index(spark, corpus, d, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, d)
    idx.delete_docs(["a", "b"])
    with pytest.raises(ValueError, match="empty index"):
        optimize_index(spark, d)
    # original index untouched by the refused merge (tombstones intact)
    idx = BM25Index(spark, d)
    assert idx.deleted is not None
    assert idx.search("alpha", 10, "or").count() == 0


def test_optimize_fingerprint_rotates(spark, tmp_path):
    d = str(tmp_path / "opt6")
    build_index(spark, _corpus(spark), d, fields={"body": "content"}, cfg=CFG)
    with open(f"{d}/stats.json") as f:
        fp0 = json.load(f)["fingerprint"]
    BM25Index(spark, d).delete_docs(["d1"])
    optimize_index(spark, d)
    with open(f"{d}/stats.json") as f:
        st = json.load(f)
    assert st["fingerprint"] != fp0
    assert st["fingerprint"]["optimized"] == 1 and st["fingerprint"]["purged"] == 1
    # group manifests carry the new fingerprint (resume-safe)
    with open(f"{d}/_manifest/group_0.json") as f:
        assert json.load(f)["fingerprint"] == st["fingerprint"]


def test_optimize_crash_before_swap_then_resume(spark, tmp_path, monkeypatch):
    """Crash safety + resume (ADVICE r04 high): a failure anywhere up to
    the swap leaves the live index byte-identical (stale-stats deletion
    semantics intact), and the retry resumes the staged encode at group
    granularity instead of redoing it."""
    import beetle_search_engine_spark.operators.build as B

    corpus = _corpus(spark)
    d = str(tmp_path / "opt7")
    build_index(spark, corpus, d, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, d)
    idx.delete_docs(["d0", "d4"])
    before_del = _res(BM25Index(spark, d), "alpha")

    real = B._encode_groups

    def crash_after_encode(*a, **k):
        real(*a, **k)  # staged encode fully lands
        raise RuntimeError("simulated crash after staged encode, before swap")

    monkeypatch.setattr(B, "_encode_groups", crash_after_encode)
    with pytest.raises(RuntimeError, match="simulated crash"):
        optimize_index(spark, d)
    # live index untouched: tombstones still applied, stats not rotated
    idx2 = BM25Index(spark, d)
    assert idx2.deleted is not None
    assert idx2.stats.get("optimize_count", 0) == 0
    assert _res(idx2, "alpha") == before_del

    monkeypatch.setattr(B, "_encode_groups", real)
    m = optimize_index(spark, d)
    # every group came from the crashed attempt's staged manifests
    assert all(g.get("skipped") for g in m["groups"])
    d2 = str(tmp_path / "ref7")
    build_index(
        spark, corpus.filter(~F.col("doc_id").isin(["d0", "d4"])), d2,
        fields={"body": "content"}, cfg=CFG,
    )
    assert _res(BM25Index(spark, d), "alpha") == _res(BM25Index(spark, d2), "alpha")


def test_lifecycle_delete_append_optimize_equals_clean_rebuild(spark, tmp_path):
    """The full index lifecycle (VERDICT r04 task 5): build -> delete ->
    append epoch -> search (stale stats, epoch-merged) -> optimize ->
    search == a from-scratch build of the NET corpus.  Pins that
    tombstones, epoch df-summing, and the physical merge compose."""
    from beetle_search_engine_spark.streaming.incremental import append_epoch

    corpus = _corpus(spark, 30)
    first_ids = [f"d{i}" for i in range(20)]
    dead = ["d0", "d5", "d12"]
    d = str(tmp_path / "life")
    build_index(
        spark, corpus.filter(F.col("doc_id").isin(first_ids)), d,
        fields={"body": "content"}, cfg=CFG,
    )
    idx = BM25Index(spark, d)
    assert idx.delete_docs(dead) == 3
    append_epoch(
        spark, d, corpus.filter(~F.col("doc_id").isin(first_ids)),
        fields={"body": "content"}, cfg=CFG,
    )
    idx = BM25Index(spark, d)
    # mid-lifecycle: deleted gone, epoch docs visible, stats still stale
    mid = {r.doc_id for r in idx.search("alpha", 40, "or").collect()}
    assert not (set(dead) & mid)
    assert {f"d{i}" for i in range(20, 30)} <= mid
    assert len(idx.stats["epochs"]) == 2 and idx.deleted is not None

    m = optimize_index(spark, d)
    assert m["deleted_purged"] == 3 and m["n_docs"] == 27
    idx = BM25Index(spark, d)
    assert idx.deleted is None and list(idx.stats["epochs"]) == ["0"]

    ref_dir = str(tmp_path / "life_ref")
    build_index(
        spark, corpus.filter(~F.col("doc_id").isin(dead)), ref_dir,
        fields={"body": "content"}, cfg=CFG,
    )
    ref = BM25Index(spark, ref_dir)
    # k > corpus size and (score, doc_id)-sorted: every surviving doc's
    # exact score must match.  (Rank-order comparison would be flaky on
    # EXACT float ties: the engine tie-breaks by docnum, and the
    # lifecycle index keeps sparse original docnums while the clean
    # rebuild renumbers — documented engine behavior, not a score bug.)
    for q, mode in [("alpha", "or"), ("alpha beta", "and"),
                    ("beta OR gamma", "parse"), ("alpha NOT gamma", "parse")]:
        got = sorted(_res(idx, q, mode, k=40))
        want = sorted(_res(ref, q, mode, k=40))
        assert got == want, (q, mode)


def test_optimize_then_append_does_not_collide_docnums(spark, tmp_path):
    """After a merge the surviving docnums stay sparse (max docnum can
    exceed the live count); a later epoch append must offset from the
    preserved next_docnum, never from n_docs — an n_docs offset would
    assign docnums that collide with live docs (two doc_ids per docnum,
    merged postings)."""
    from beetle_search_engine_spark.streaming.incremental import append_epoch

    idx_dir = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 24), idx_dir, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, idx_dir)
    idx.delete_docs([f"d{i}" for i in range(0, 24, 2)])  # 12 deleted
    optimize_index(spark, idx_dir)
    with open(f"{idx_dir}/stats.json") as f:
        st = json.load(f)
    assert st["n_docs"] == 12 and st["next_docnum"] == 24  # sparse survivors
    new = spark.createDataFrame(
        [(f"n{i}", "alpha omega new document") for i in range(4)],
        "doc_id string, content string",
    )
    append_epoch(spark, idx_dir, new, fields={"body": "content"}, cfg=CFG)
    docids = spark.read.parquet(f"{idx_dir}/docids").collect()
    assert len(docids) == 16
    by_num = {}
    for r in docids:
        by_num.setdefault(r.docnum, []).append(r.doc_id)
    dupes = {k: v for k, v in by_num.items() if len(v) > 1}
    assert dupes == {}, dupes  # the collision the fix prevents
    # and the combined index answers like a clean build of the net corpus
    clean_dir = str(tmp_path / "clean")
    survivors = _corpus(spark, 24).filter(~F.col("doc_id").isin([f"d{i}" for i in range(0, 24, 2)]))
    build_index(spark, survivors.unionByName(new), clean_dir, fields={"body": "content"}, cfg=CFG)
    got = _res(BM25Index(spark, idx_dir), "alpha")
    want = _res(BM25Index(spark, clean_dir), "alpha")
    assert got == want


def test_rebuild_over_epoch_appended_index_is_full_rebuild(spark, tmp_path):
    """A full-corpus build_index(resume=True) over an index that has
    epoch appends must NOT reuse prior stats/manifests: the combined
    fingerprint xor can equal the fresh full-corpus one while docids
    and groups are numbered per-epoch — reuse would silently mismatch
    postings docnums against the retained docids dimension."""
    from beetle_search_engine_spark.streaming.incremental import append_epoch

    base = _corpus(spark, 16)
    extra = spark.createDataFrame(
        [(f"x{i}", "alpha extra words here") for i in range(4)],
        "doc_id string, content string",
    )
    idx_dir = str(tmp_path / "idx")
    build_index(spark, base, idx_dir, fields={"body": "content"}, cfg=CFG)
    append_epoch(spark, idx_dir, extra, fields={"body": "content"}, cfg=CFG)
    m = build_index(
        spark, base.unionByName(extra), idx_dir, fields={"body": "content"}, cfg=CFG
    )
    assert m["groups_built"] == CFG.index.bucket_groups  # nothing skipped
    clean = str(tmp_path / "clean")
    build_index(spark, base.unionByName(extra), clean, fields={"body": "content"}, cfg=CFG)
    assert _res(BM25Index(spark, idx_dir), "alpha") == _res(BM25Index(spark, clean), "alpha")


def test_noop_resume_skips_heavy_stages(spark, tmp_path):
    """Re-running build_index over a complete index short-circuits after
    the staging fingerprint: all groups skipped, no docids rewrite, and
    queries unchanged."""
    import os
    import time as _time

    idx_dir = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 24), idx_dir, fields={"body": "content"}, cfg=CFG)
    before = _res(BM25Index(spark, idx_dir), "alpha")
    docids_mtime = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(f"{idx_dir}/docids") for f in fs
    )
    _time.sleep(0.05)
    m = build_index(spark, _corpus(spark, 24), idx_dir, fields={"body": "content"}, cfg=CFG)
    assert m["groups_built"] == 0
    assert m["groups_skipped"] == CFG.index.bucket_groups
    assert m["postings"] > 0  # metrics survive from the manifests
    after = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(f"{idx_dir}/docids") for f in fs
    )
    assert after == docids_mtime  # docids untouched
    assert _res(BM25Index(spark, idx_dir), "alpha") == before


def test_optimize_rejects_mismatched_layout_cfg(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 16), idx_dir, fields={"body": "content"}, cfg=CFG)
    bad = EngineConfig(
        analyzer="sql",
        index=IndexConfig(n_buckets=16, bucket_groups=2, chunk_docs=8),
    )
    with pytest.raises(ValueError, match="stored layout"):
        optimize_index(spark, idx_dir, cfg=bad)

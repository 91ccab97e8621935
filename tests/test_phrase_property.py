"""Property tests: positional phrase retrieval == brute-force adjacency
over random corpora (seeded), single- and multi-epoch."""

import random

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.functions.analyzer import get_analyzer
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.query import BM25Index
from beetle_search_engine_spark.streaming.incremental import append_epoch

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the", "of",
         "scan", "table", "spark", "query"]

CFG = EngineConfig(
    analyzer="sql",
    index=IndexConfig(n_buckets=4, bucket_groups=2, chunk_docs=16,
                      encode_partitions=4, hot_df_threshold=10_000,
                      store_positions=True),
)


def _mk_docs(rng, n, start=0):
    return [
        (f"d{start + i}", " ".join(rng.choices(VOCAB, k=rng.randint(5, 30))))
        for i in range(n)
    ]


def _brute_phrase(docs, phrase_text):
    A = get_analyzer("sql")
    q = A.analyze_pos(phrase_text)
    offs = [i - q[0][1] for _, i in q]
    terms = [t for t, _ in q]
    hits = set()
    for doc_id, text in docs:
        pos: dict[str, list[int]] = {}
        for t, i in A.analyze_pos(text):
            pos.setdefault(t, []).append(i)
        valid = pos.get(terms[0], [])
        for j in range(1, len(terms)):
            nxt = set(pos.get(terms[j], []))
            valid = [p for p in valid if p + offs[j] in nxt]
        if valid:
            hits.add(doc_id)
    return hits


def test_phrase_matches_bruteforce_random(spark, tmp_path):
    rng = random.Random(1234)
    docs = _mk_docs(rng, 60)
    corpus = spark.createDataFrame(docs, "doc_id string, content string")
    idx_dir = str(tmp_path / "prop_idx")
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, idx_dir)
    for trial in range(8):
        n_words = rng.choice([2, 2, 3])
        phrase = " ".join(rng.choices([w for w in VOCAB if w not in ("the", "of")], k=n_words))
        expect = _brute_phrase(docs, f'"{phrase}"'.strip('"'))
        got = {r["doc_id"] for r in idx.search(f'"{phrase}"', 100, "parse").collect()}
        assert got == expect, (phrase, got, expect)


def test_phrase_with_stopword_gap_random(spark, tmp_path):
    rng = random.Random(99)
    docs = _mk_docs(rng, 50)
    corpus = spark.createDataFrame(docs, "doc_id string, content string")
    idx_dir = str(tmp_path / "gap_idx")
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=CFG)
    idx = BM25Index(spark, idx_dir)
    phrase = "scan the table"  # 'the' drops -> gap (0, 2)
    expect = _brute_phrase(docs, phrase)
    got = {r["doc_id"] for r in idx.search(f'"{phrase}"', 100, "parse").collect()}
    assert got == expect


def test_phrase_is_per_field(spark, tmp_path):
    """Whoosh phrase semantics: terms must be adjacent WITHIN one field —
    a phrase never spans the title/body boundary."""
    rows = [
        ("x", "alpha beta", "gamma delta"),        # phrase candidates split across fields
        ("y", "alpha", "beta gamma"),              # 'beta gamma' adjacent in body only
        ("z", "alpha beta", "other words here"),   # 'alpha beta' adjacent in title
    ]
    corpus = spark.createDataFrame(rows, "doc_id string, title string, content string")
    idx_dir = str(tmp_path / "mf_idx")
    build_index(spark, corpus, idx_dir, fields={"title": "title", "body": "content"}, cfg=CFG)
    idx = BM25Index(spark, idx_dir)

    def ids(q):
        return {r["doc_id"] for r in idx.search(q, 10, "parse").collect()}

    assert ids('"alpha beta"') == {"x", "z"}
    assert ids('"beta gamma"') == {"y"}       # NOT x: beta(title) + gamma(body)
    assert ids('"gamma delta"') == {"x"}
    assert ids('"delta gamma"') == set()      # order matters


def test_phrase_across_epochs(spark, tmp_path):
    rng = random.Random(7)
    base = _mk_docs(rng, 30)
    extra = _mk_docs(rng, 30, start=30)
    idx_dir = str(tmp_path / "epoch_idx")
    build_index(
        spark,
        spark.createDataFrame(base, "doc_id string, content string"),
        idx_dir, fields={"body": "content"}, cfg=CFG,
    )
    append_epoch(
        spark, idx_dir,
        spark.createDataFrame(extra, "doc_id string, content string"),
        fields={"body": "content"}, cfg=CFG,
    )
    idx = BM25Index(spark, idx_dir)
    for phrase in ("alpha beta", "table scan", "query spark"):
        expect = _brute_phrase(base + extra, phrase)
        got = {r["doc_id"] for r in idx.search(f'"{phrase}"', 100, "parse").collect()}
        assert got == expect, phrase
        # epoch docs reachable at all
    assert idx.stats["n_docs"] == 60

"""Nested boolean groups: ``(a b) OR (c d)`` as Or(And(a,b), And(c,d))
— the round-5 close of VERDICT r04 "What's missing" #3.  Whoosh matcher
semantics (reference exposes the full parser to users,
search_bm25.py:32-33 via app.py:28-33): And sums all children, Or sums
only the MATCHING children — a doc matching branch (a b) but not (c d)
scores a+b even when c is present.  The oracle here is compositional:
per-term BM25 scores from single-term searches on the SAME index, summed
per matching branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.functions.analyzer import get_analyzer
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.parser import parse_query, tree_terms
from beetle_search_engine_spark.plans.query import BM25Index

CFG = EngineConfig(
    analyzer="sql",
    index=IndexConfig(n_buckets=4, bucket_groups=1, chunk_docs=8, encode_partitions=4),
)

DOCS = [
    ("d1", "alpha beta filler1"),                    # branch1 only
    ("d2", "gamma delta filler2"),                   # branch2 only
    ("d3", "alpha beta gamma filler3"),              # branch1 + stray gamma
    ("d4", "alpha beta gamma delta filler4"),        # both branches
    ("d5", "alpha filler5"),                         # neither
    ("d6", "gamma filler6"),                         # neither
    ("d7", "alpha beta eta filler7"),                # branch1 + eta
    ("d8", "delta filler8"),
    ("d9", "alpha beta delta filler9"),              # branch1 + stray delta
    ("d10", "theta filler10 filler10b"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nested") / "idx")
    corpus = spark.createDataFrame(DOCS, "doc_id string, content string")
    build_index(spark, corpus, d, fields={"body": "content"}, cfg=CFG)
    return BM25Index(spark, d)


@pytest.fixture(scope="module")
def term_scores(idx):
    """doc_id -> {term: bm25 score} from single-term searches — the
    compositional oracle basis."""
    out: dict[str, dict[str, float]] = {}
    for t in ["alpha", "beta", "gamma", "delta", "eta"]:
        for r in idx.search(t, 20, "or").collect():
            out.setdefault(r.doc_id, {})[t] = r.score
    return out


def _got(idx, q, **kw):
    return {r.doc_id: r.score for r in idx.search(q, 20, "parse", **kw).collect()}


# ---------------------------------------------------------------------------
# parser


def test_parser_builds_nested_tree():
    an = get_analyzer("sql")
    pq = parse_query("(alpha beta) OR (gamma delta)", an)
    assert pq.tree == (
        "or",
        (
            ("and", (("term", "alpha"), ("term", "beta"))),
            ("and", (("term", "gamma"), ("term", "delta"))),
        ),
    )
    assert pq.mode == "group" and pq.groups == []
    assert tree_terms(pq.tree) == ["alpha", "beta", "gamma", "delta"]


def test_parser_flat_shapes_keep_flat_model():
    an = get_analyzer("sql")
    # (a OR b) c and ((a b) c) are expressible flat -> no tree
    assert parse_query("(alpha OR beta) gamma", an).tree is None
    assert parse_query("((alpha beta) gamma)", an).tree is None  # And-under-And flattens
    assert parse_query("alpha beta", an).tree is None


def test_parser_guards_degrade_to_flat():
    an = get_analyzer("sql")
    # modifier inside a group, phrase+parens, unbalanced: flat reading
    assert parse_query("(alpha NOT beta) OR (gamma delta)", an).tree is None
    assert parse_query('"epsilon zeta" (alpha beta) OR gamma', an).tree is None
    assert parse_query("(alpha beta OR gamma", an).tree is None
    assert parse_query("REQUIRE (alpha beta) OR gamma", an).tree is None


def test_parser_top_level_modifiers_compose():
    an = get_analyzer("sql")
    pq = parse_query("(alpha beta) OR (gamma delta) NOT eta", an)
    assert pq.tree is not None and pq.excluded == ["eta"]
    pq2 = parse_query("(alpha beta) OR (gamma delta) ANDMAYBE eta", an)
    assert pq2.tree is not None and pq2.maybe_terms == ["eta"]


# ---------------------------------------------------------------------------
# kernel semantics


@pytest.mark.parametrize("prefer_local", [True, False])
def test_or_of_ands_matching_branch_scores(idx, term_scores, prefer_local):
    got = _got(idx, "(alpha beta) OR (gamma delta)", prefer_local=prefer_local)
    # candidates: docs matching >=1 full branch
    assert set(got) == {"d1", "d2", "d3", "d4", "d7", "d9"}
    s = term_scores
    # d3 has stray gamma: branch2 unmatched, gamma must NOT score
    assert got["d3"] == pytest.approx(s["d3"]["alpha"] + s["d3"]["beta"], rel=1e-9)
    # d9 stray delta likewise
    assert got["d9"] == pytest.approx(s["d9"]["alpha"] + s["d9"]["beta"], rel=1e-9)
    # d4 matches both branches: all four score
    assert got["d4"] == pytest.approx(
        sum(s["d4"][t] for t in ("alpha", "beta", "gamma", "delta")), rel=1e-9
    )
    assert got["d1"] == pytest.approx(s["d1"]["alpha"] + s["d1"]["beta"], rel=1e-9)
    assert got["d2"] == pytest.approx(s["d2"]["gamma"] + s["d2"]["delta"], rel=1e-9)


def test_deep_nesting(idx, term_scores):
    got = _got(idx, "((alpha beta) OR gamma) delta")
    # delta required AND (alpha&beta OR gamma)
    assert set(got) == {"d2", "d4", "d9"}
    s = term_scores
    assert got["d2"] == pytest.approx(s["d2"]["gamma"] + s["d2"]["delta"], rel=1e-9)
    # d4: both Or-children match -> alpha+beta+gamma, plus delta
    assert got["d4"] == pytest.approx(
        sum(s["d4"][t] for t in ("alpha", "beta", "gamma", "delta")), rel=1e-9
    )
    assert got["d9"] == pytest.approx(
        s["d9"]["alpha"] + s["d9"]["beta"] + s["d9"]["delta"], rel=1e-9
    )


def test_nested_with_not(idx):
    got = _got(idx, "(alpha beta) OR (gamma delta) NOT eta")
    assert set(got) == {"d1", "d2", "d3", "d4", "d9"}  # d7 dropped (eta)


def test_nested_with_andmaybe(idx, term_scores):
    got = _got(idx, "(alpha beta) OR (gamma delta) ANDMAYBE eta")
    base = _got(idx, "(alpha beta) OR (gamma delta)")
    assert set(got) == set(base)  # ANDMAYBE never gates
    s = term_scores
    assert got["d7"] == pytest.approx(base["d7"] + s["d7"]["eta"], rel=1e-9)
    assert got["d1"] == pytest.approx(base["d1"], rel=1e-9)  # no eta: unchanged


def test_nested_with_boost(idx, term_scores):
    got = _got(idx, "(alpha^2 beta) OR (gamma delta)")
    s = term_scores
    assert got["d3"] == pytest.approx(2 * s["d3"]["alpha"] + s["d3"]["beta"], rel=1e-9)
    assert got["d4"] == pytest.approx(
        2 * s["d4"]["alpha"] + sum(s["d4"][t] for t in ("beta", "gamma", "delta")),
        rel=1e-9,
    )


def test_nested_batch_parity(idx):
    """search_many answers a nested query identically to search()."""
    single = _got(idx, "((alpha beta) OR gamma) delta")
    batch = idx.search_many(
        {"nested": "((alpha beta) OR gamma) delta", "plain": "alpha beta"}, 20, "parse"
    )
    got = {
        r.doc_id: r.score for r in batch.collect() if r.query_id == "nested"
    }
    assert got == single


# ---------------------------------------------------------------------------
# boost normalization (Whoosh Query.normalize semantics, round 5)


def test_boost_normalize_distinct_values_sum():
    an = get_analyzer("sql")
    assert parse_query("alpha^2 alpha^3 beta", an).boosts == {"alpha": 5.0}
    assert parse_query("alpha alpha^3", an).boosts == {"alpha": 4.0}
    assert parse_query("alpha^2 alpha^2", an).boosts == {"alpha": 2.0}  # dup collapses
    assert parse_query("alpha alpha", an).boosts == {}
    assert parse_query("(alpha^2 beta) OR (gamma alpha^3)", an).boosts == {"alpha": 5.0}


def test_boost_normalize_scores(idx, term_scores):
    """a^2 a^3 scores 5x a's contribution end-to-end."""
    got = {r.doc_id: r.score for r in idx.search("alpha^2 alpha^3", 20, "parse").collect()}
    s = term_scores
    assert got["d5"] == pytest.approx(5 * s["d5"]["alpha"], rel=1e-9)
    base = {r.doc_id: r.score for r in idx.search("alpha", 20, "parse").collect()}
    assert set(got) == set(base)

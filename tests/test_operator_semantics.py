"""Whoosh operator semantics (round 4): query boosts ``term^2.5``,
``ANDMAYBE`` (score-only operands) and ``REQUIRE`` (filter-only
operands).  Driver-oracle-gated end-to-end (engine_term_boost /
engine_andmaybe / engine_require); these tests pin parser routing and
the kernel score algebra on a controlled corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.functions.analyzer import get_analyzer
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.plans.parser import parse_query
from beetle_search_engine_spark.plans.query import BM25Index

AZ = get_analyzer("sql")


# ---------------------------------------------------------------------------
# parser


def test_boost_is_recorded_not_discarded():
    pq = parse_query("spark^2.5 table", AZ)
    assert pq.boosts == {"spark": 2.5}
    assert sorted(pq.terms) == ["spark", "table"]


def test_andmaybe_operand_scores_but_never_gates():
    pq = parse_query("spark table ANDMAYBE scan", AZ)
    assert pq.maybe_terms == ["scan"]
    assert "scan" not in pq.terms
    assert sorted(t for c in pq.groups for t in c) == ["spark", "table"]


def test_andmaybe_boost_kept_and_not_overrides():
    pq = parse_query("spark ANDMAYBE scan^2", AZ)
    assert pq.maybe_terms == ["scan"] and pq.boosts == {"scan": 2.0}
    pq = parse_query("spark ANDMAYBE NOT scan", AZ)
    assert pq.maybe_terms == [] and pq.excluded == ["scan"]


def test_require_operand_filters_but_never_scores():
    pq = parse_query("spark REQUIRE scan", AZ)
    assert pq.filter_terms == ["scan"]
    assert pq.terms == ["spark"]


def test_maybe_or_filter_force_conjunctive_kernel():
    # a single OR group alone routes to WAND; ANDMAYBE/REQUIRE force the
    # conjunctive kernel (the one that honors them)
    assert parse_query("spark OR table", AZ).mode == "or"
    assert parse_query("spark OR table ANDMAYBE scan", AZ).mode == "group"
    assert parse_query("spark OR table REQUIRE scan", AZ).mode == "group"


def test_scored_term_wins_over_modifier_duplicate():
    # a term both scored and REQUIRE'd stays a plain scored term
    pq = parse_query("scan spark REQUIRE scan", AZ)
    assert pq.filter_terms == [] and sorted(pq.terms) == ["scan", "spark"]


def test_andmaybe_expansion_is_dropped():
    pq = parse_query("spark ANDMAYBE sc*", AZ)
    assert pq.prefixes == [] and pq.maybe_terms == []
    assert pq.terms == ["spark"]


# ---------------------------------------------------------------------------
# engine


CFG = EngineConfig(
    analyzer="sql",
    index=IndexConfig(n_buckets=4, bucket_groups=1, chunk_docs=8, encode_partitions=4),
)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("opsem") / "idx")
    rows = []
    for i in range(16):
        toks = ["alpha"]
        if i % 2 == 0:
            toks.append("beta")
        if i % 4 == 0:
            toks.append("gamma")
        rows.append((f"d{i}", " ".join(toks * (1 + i % 3))))
    corpus = spark.createDataFrame(rows, "doc_id string, content string")
    build_index(spark, corpus, d, fields={"body": "content"}, cfg=CFG)
    return BM25Index(spark, d)


def _scores(idx, q, mode="parse", **kw):
    return {r.doc_id: r.score for r in idx.search(q, 20, mode, **kw).collect()}


def test_boost_multiplies_contribution_conjunctive(idx):
    base_a = _scores(idx, "alpha")
    base_b = _scores(idx, "beta")
    boosted = _scores(idx, "alpha^3 beta")
    plain = _scores(idx, "alpha beta")
    assert set(boosted) == set(plain)
    for doc in boosted:
        assert boosted[doc] == pytest.approx(3 * base_a[doc] + base_b[doc], rel=1e-9)


@pytest.mark.parametrize("prefer_local", [True, False])
def test_boost_in_wand_or_path(idx, prefer_local):
    # pure OR group with a boost stays on the WAND path (mode == "or")
    base_a = _scores(idx, "alpha", prefer_local=prefer_local)
    got = _scores(idx, "alpha^3 OR gamma", prefer_local=prefer_local)
    base_g = _scores(idx, "gamma", prefer_local=prefer_local)
    for doc, s in got.items():
        want = 3 * base_a.get(doc, 0.0) + base_g.get(doc, 0.0)
        assert s == pytest.approx(want, rel=1e-9)


def test_andmaybe_set_identical_scores_differ(idx):
    plain = _scores(idx, "alpha")
    maybed = _scores(idx, "alpha ANDMAYBE gamma")
    gamma = _scores(idx, "gamma")
    assert set(maybed) == set(plain)  # result SET never changes
    for doc, s in maybed.items():
        assert s == pytest.approx(plain[doc] + gamma.get(doc, 0.0), rel=1e-9)


def test_require_filters_without_scoring(idx):
    alpha = _scores(idx, "alpha")
    req = _scores(idx, "alpha REQUIRE gamma")
    gamma_docs = set(_scores(idx, "gamma"))
    assert set(req) == gamma_docs  # gated to docs containing gamma
    for doc, s in req.items():
        assert s == pytest.approx(alpha[doc], rel=1e-9)  # gamma adds nothing


def test_require_missing_term_empties_result(idx):
    assert idx.search("alpha REQUIRE zzzmissing", 10, "parse").count() == 0

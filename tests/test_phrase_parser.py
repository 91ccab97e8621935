"""Query parser + positional index + phrase search.

Covers the MultifieldParser-analog grammar (reference feeds raw user
strings through Whoosh's parser, src/search/search_bm25.py:32-33), the
position codec roundtrip, and end-to-end phrase retrieval incl. the
Whoosh renumbered position semantics (StopFilter renumber=True: a
stopword inside a phrase leaves NO gap — kept neighbors must be adjacent;
round-6 parity fix).
"""

import numpy as np
import pytest

from beetle_search_engine_spark.config import EngineConfig, IndexConfig
from beetle_search_engine_spark.functions.analyzer import get_analyzer
from beetle_search_engine_spark.operators.build import build_index
from beetle_search_engine_spark.operators.codecs import decode_positions, encode_positions_rows
from beetle_search_engine_spark.plans.parser import parse_query, tree_terms
from beetle_search_engine_spark.plans.query import BM25Index

W = get_analyzer("whoosh")
S = get_analyzer("sql")


def test_parse_bare_terms_default_and():
    pq = parse_query("transformer models", W)
    assert pq.terms == ["transform", "model"]
    assert pq.mode == "and"
    assert pq.phrases == []


def test_parse_explicit_or():
    pq = parse_query("spark OR flink", S)
    assert pq.mode == "or"
    assert pq.terms == ["spark", "flink"]
    assert pq.groups == [["spark", "flink"]]


def test_parse_or_group_infix_precedence():
    # Whoosh default AndGroup with infix Or: x OR y z == And(Or(x,y), z)
    pq = parse_query("spark OR flink scan", S)
    assert pq.mode == "group"
    assert pq.groups == [["spark", "flink"], ["scan"]]
    assert pq.terms == ["spark", "flink", "scan"]


def test_parse_or_chain():
    pq = parse_query("a1 OR b1 OR c1 d1", S)
    assert pq.mode == "group"
    assert pq.groups == [["a1", "b1", "c1"], ["d1"]]


def test_parse_two_or_groups():
    pq = parse_query("a1 OR b1 c1 OR d1", S)
    assert pq.mode == "group"
    assert pq.groups == [["a1", "b1"], ["c1", "d1"]]


def test_parse_leading_trailing_or_is_noise():
    pq = parse_query("OR spark scan OR", S)
    assert pq.mode == "and"
    assert pq.groups == [["spark"], ["scan"]]


def test_parse_or_with_fielded_member():
    pq = parse_query("title:spark OR flink scan", S, fields={"title", "body"})
    assert pq.mode == "group"
    assert pq.groups == [["spark", "flink"], ["scan"]]
    assert pq.fielded == {"spark": "title"}


def test_parse_or_before_not_drops_or():
    # Or(x, Not(y)) has no AndNot reading -> the OR drops (documented)
    pq = parse_query("spark OR NOT flink scan", S)
    assert pq.mode == "and"
    assert pq.groups == [["spark"], ["scan"]]
    assert pq.excluded == ["flink"]


def test_parse_negated_phrase():
    pq = parse_query('spark NOT "big data"', S)
    assert pq.terms == ["spark"]
    assert pq.excluded == []
    assert pq.excluded_phrases == [[("big", 0), ("data", 1)]]
    assert pq.mode == "and"


def test_parse_negated_phrase_minus_and_fielded():
    pq = parse_query('scan -"stream join" NOT title:"big data"', S, fields={"title"})
    assert pq.terms == ["scan"]
    assert {tuple(p) for p in pq.excluded_phrases} == {
        (("stream", 0), ("join", 1)),
        (("big", 0), ("data", 1)),
    }


def test_parse_negated_single_term_phrase_degrades_to_not():
    pq = parse_query('spark NOT "shuffle"', S)
    assert pq.terms == ["spark"]
    assert pq.excluded == ["shuffle"]
    assert pq.excluded_phrases == []


def test_parse_group_with_phrase_keeps_group_mode():
    pq = parse_query('"big data" spark OR flink', S)
    assert pq.mode == "group"
    assert pq.phrases == [[("big", 0), ("data", 1)]]
    # phrase terms are required singletons after the parsed clauses
    assert pq.groups == [["spark", "flink"], ["big"], ["data"]]


def test_parse_prefix_token():
    pq = parse_query("Trans* scan", S)
    assert pq.prefixes == ["trans"]  # lowercased, unstemmed
    assert pq.terms == ["scan"]
    assert not pq.empty


def test_parse_prefix_pure_query_not_empty():
    pq = parse_query("trans*", S)
    assert pq.terms == [] and pq.prefixes == ["trans"]
    assert not pq.empty


def test_parse_prefix_fielded_and_negated():
    pq = parse_query("scan title:tr* -zz* NOT qq*", S, fields={"title"})
    assert pq.prefixes == ["tr"]
    assert pq.prefix_fields == {"tr": "title"}
    assert sorted(pq.excluded_prefixes) == ["qq", "zz"]


def test_parse_prefix_too_short_degrades():
    # <2 literal chars degrades to plain text (the analyzer strips the
    # star); mid-word wildcards with >=2 literals are real wildcards
    pq = parse_query("t* te*t scan", S)
    assert pq.prefixes == []
    assert pq.wildcards == ["te*t"]
    assert set(pq.terms) == {"scan"}  # 't' dropped by minsize


def test_parse_prefix_does_not_join_or_group():
    pq = parse_query("spark OR tr* scan", S)
    assert pq.prefixes == ["tr"]
    assert pq.groups == [["spark"], ["scan"]]
    assert pq.mode == "and"


def test_parse_midword_wildcard():
    pq = parse_query("Te?t t*st scan", S)
    assert pq.wildcards == ["te?t", "t*st"]
    assert pq.terms == ["scan"]
    assert pq.prefixes == []


def test_parse_wildcard_trailing_star_stays_prefix():
    # pure trailing star routes to the cheap prefix path, not fnmatch
    pq = parse_query("tr* t?r* scan", S)
    assert pq.prefixes == ["tr"]
    assert pq.wildcards == ["t?r*"]


def test_parse_wildcard_fielded_negated_and_too_few_literals():
    pq = parse_query("scan title:m?dels -w?ld a*", S, fields={"title"})
    assert pq.wildcards == ["m?dels"]
    assert pq.wildcard_fields == {"m?dels": "title"}
    assert pq.excluded_wildcards == ["w?ld"]
    assert pq.prefixes == []  # 'a*' has 1 literal -> degrades
    assert "a" not in pq.terms  # minsize drops the bare 'a'


def test_parse_term_range():
    from beetle_search_engine_spark.plans.parser import TermRange

    pq = parse_query("[Alpha TO beta] scan", S)
    assert pq.ranges == [TermRange("alpha", "beta", True, True, None)]
    assert pq.terms == ["scan"]
    assert not pq.empty


def test_parse_term_range_exclusive_fielded_negated_open():
    from beetle_search_engine_spark.plans.parser import TermRange

    pq = parse_query(
        "scan title:{aa TO bb] NOT [zz TO] -{qq TO rr}", S, fields={"title"}
    )
    assert pq.ranges == [TermRange("aa", "bb", False, True, "title")]
    assert pq.excluded_ranges == [
        TermRange("zz", None, True, True, None),
        TermRange("qq", "rr", False, False, None),
    ]


def test_parse_range_unknown_field_goes_global():
    from beetle_search_engine_spark.plans.parser import TermRange

    pq = parse_query("zzz:[a1 TO b1] scan", S, fields={"title"})
    assert pq.ranges == [TermRange("a1", "b1", True, True, None)]


def test_parse_and_is_noop():
    pq = parse_query("spark AND flink", S)
    assert pq.mode == "and"
    assert pq.terms == ["spark", "flink"]


def test_parse_quoted_phrase_forces_and():
    pq = parse_query('"transformer models" OR nlp', W)
    assert pq.mode == "and"  # a phrase is a conjunctive constraint
    assert pq.phrases == [[("transform", 0), ("model", 1)]]
    assert set(pq.terms) == {"transform", "model", "nlp"}


def test_parse_phrase_renumbers_stopword_gap():
    # "state of the art": of/the are stopwords; Whoosh's StopFilter
    # renumbers kept tokens (renumber=True), so state/art are ADJACENT
    # after analysis (round-6 parity fix: was [(state,0),(art,3)])
    pq = parse_query('"state of the art"', S)
    assert pq.phrases == [[("state", 0), ("art", 1)]]


def test_parse_single_term_phrase_degrades():
    pq = parse_query('"spark" scan', S)
    assert pq.phrases == []
    assert set(pq.terms) == {"spark", "scan"}


def test_parse_field_prefix_known_field():
    pq = parse_query("title:spark scan", S, fields={"title", "body"})
    assert pq.terms == ["spark", "scan"]
    assert pq.fielded == {"spark": "title"}


def test_parse_field_prefix_unknown_field_degrades():
    # 'zzz' is not an index field -> the token is plain text; the
    # analyzer splits 'zzz:spark' into two ordinary terms
    pq = parse_query("zzz:spark scan", S, fields={"title", "body"})
    assert pq.fielded == {}
    assert set(pq.terms) == {"zzz", "spark", "scan"}


def test_parse_field_prefix_without_schema_degrades():
    pq = parse_query("title:spark", S)  # no fields passed
    assert pq.fielded == {}
    assert set(pq.terms) == {"title", "spark"}


def test_parse_not_keyword():
    pq = parse_query("spark NOT shuffle", S)
    assert pq.terms == ["spark"]
    assert pq.excluded == ["shuffle"]
    assert pq.mode == "and"


def test_parse_minus_prefix():
    pq = parse_query("spark -shuffle scan", S)
    assert pq.terms == ["spark", "scan"]
    assert pq.excluded == ["shuffle"]


def test_parse_not_with_field_prefix_excludes_globally():
    pq = parse_query("scan NOT title:spark", S, fields={"title", "body"})
    assert pq.terms == ["scan"]
    assert pq.excluded == ["spark"]
    assert pq.fielded == {}


def test_parse_not_stemmed_and_or_mode():
    # excluded terms run through the same analyzer chain; OR mode kept
    pq = parse_query("spark OR flink NOT models", W)
    assert pq.mode == "or"
    assert pq.excluded == ["model"]


def test_parse_fielded_phrase_drops_dangling_prefix():
    # title:"big data" — the phrase is extracted first; the leftover
    # 'title:' qualifier must not become a required term
    pq = parse_query('title:"big data" scan', S, fields={"title", "body"})
    assert pq.phrases == [[("big", 0), ("data", 1)]]
    assert "title" not in pq.terms
    assert set(pq.terms) == {"big", "data", "scan"}


def test_parse_lowercase_not_is_a_stopword():
    # only uppercase NOT is an operator; 'not' stays the stopword it was
    pq = parse_query("spark not shuffle", S)
    assert pq.terms == ["spark", "shuffle"]
    assert pq.excluded == []


def test_parse_empty():
    assert parse_query("", W).empty
    assert parse_query("the of a", W).empty  # all stopwords


def test_position_codec_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n_postings = int(rng.integers(1, 30))
        plists = []
        for _p in range(n_postings):
            k = int(rng.integers(1, 12))
            plists.append(np.unique(rng.integers(0, 500, size=k)).astype(np.int64))
        allpos = np.concatenate(plists)
        counts = np.array([len(p) for p in plists], dtype=np.int64)
        posting_starts = np.zeros(n_postings, dtype=np.int64)
        np.cumsum(counts[:-1], out=posting_starts[1:])
        # two rows: split postings roughly in half
        row_starts = np.array([0, n_postings // 2] if n_postings > 1 else [0], dtype=np.int64)
        bins = encode_positions_rows(allpos, posting_starts, row_starts)
        row_ends = np.append(row_starts[1:], n_postings)
        for b, (rs, re_) in zip(bins, zip(row_starts, row_ends)):
            flat, starts = decode_positions(b, counts[rs:re_])
            expect = np.concatenate(plists[rs:re_])
            assert np.array_equal(flat, expect)


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_path_factory):
    rows = [
        ("a", "the transformer models beat older systems"),   # adjacent
        ("b", "models transformer pipelines"),                # wrong order
        ("c", "transformer deep models"),                     # gap
        ("d", "big transformer models run fast"),             # adjacent
        ("e", "transformer for models"),                      # stopword removed -> ADJACENT (Whoosh renumber=True)
        ("f", "state of the art transformer"),                # stopwords removed -> state,art adjacent
        ("g", "state art transformer"),                       # literally adjacent -> same kept stream as f
    ]
    corpus = spark.createDataFrame(rows, "doc_id string, content string")
    idx_dir = str(tmp_path_factory.mktemp("phrase_idx"))
    cfg = EngineConfig(
        index=IndexConfig(
            n_buckets=4, bucket_groups=1, chunk_docs=64, encode_partitions=4,
            hot_df_threshold=1000, store_positions=True,
        )
    )
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=cfg)
    return BM25Index(spark, idx_dir)


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_phrase_search_adjacent_only(phrase_index):
    # e's 'for' is a removed stopword: renumbered positions make
    # transformer/models adjacent there, matching Whoosh
    res = phrase_index.search('"transformer models"', 10, mode="parse")
    assert _ids(res) == {"a", "d", "e"}


def test_phrase_across_stopwords_matches_whoosh(phrase_index):
    # '"state of the art"' analyzes to the adjacent pair (state, art) —
    # Whoosh renumbering makes it equal to '"state art"', so BOTH f
    # ('state of the art ...') and g ('state art ...') match
    res = phrase_index.search('"state of the art"', 10, mode="parse")
    assert _ids(res) == {"f", "g"}
    assert _ids(phrase_index.search('"state art"', 10, mode="parse")) == {"f", "g"}


def test_parse_mode_or_vs_and(phrase_index):
    both = phrase_index.search("transformer pipelines", 10, mode="parse")
    assert _ids(both) == {"b"}  # AND default: only b has both
    either = phrase_index.search("transformer OR pipelines", 10, mode="parse")
    assert _ids(either) == {"a", "b", "c", "d", "e", "f", "g"}


def test_or_group_search(phrase_index):
    # And(Or(pipelines, deep), models): docs with models = {a,b,c,d,e};
    # pipelines -> b, deep -> c
    res = phrase_index.search("pipelines OR deep models", 10, mode="parse")
    assert _ids(res) == {"b", "c"}


def test_or_group_search_distributed(phrase_index):
    res = phrase_index.search(
        "pipelines OR deep models", 10, mode="parse", prefer_local=False
    )
    assert _ids(res) == {"b", "c"}


def test_or_group_absent_member(phrase_index):
    # zzz never indexed: the group still matches via pipelines
    res = phrase_index.search("pipelines OR zzz models", 10, mode="parse")
    assert _ids(res) == {"b"}


def test_or_group_scores_sum_matching_members(phrase_index):
    # doc b matches both group members -> its group score is the sum;
    # compare against the pure-term searches (UnionMatcher semantics)
    grp = {r["doc_id"]: r["score"] for r in
           phrase_index.search("pipelines OR transformer", 10, mode="parse").collect()}
    pipe = {r["doc_id"]: r["score"] for r in
            phrase_index.search("pipelines", 10, mode="parse").collect()}
    tra = {r["doc_id"]: r["score"] for r in
           phrase_index.search("transformer", 10, mode="parse").collect()}
    for doc, s in grp.items():
        assert s == pytest.approx(pipe.get(doc, 0.0) + tra.get(doc, 0.0), rel=1e-12)


def test_negated_phrase_search(phrase_index):
    # all docs have transformer; drop those containing "transformer models"
    res = phrase_index.search('transformer NOT "transformer models"', 10, mode="parse")
    assert _ids(res) == {"b", "c", "f", "g"}


def test_negated_phrase_search_distributed(phrase_index):
    res = phrase_index.search(
        'transformer NOT "transformer models"', 10, mode="parse", prefer_local=False
    )
    assert _ids(res) == {"b", "c", "f", "g"}


def test_negated_phrase_with_or_group(phrase_index):
    # And(Or(state, models), Not(Phrase(transformer models)))
    # state|models docs: a,b,c,d,e,f,g minus phrase docs {a,d,e}
    res = phrase_index.search('state OR models NOT "transformer models"', 10, mode="parse")
    assert _ids(res) == {"b", "c", "f", "g"}


def test_prefix_search(phrase_index):
    # trans* expands to {transformer} here; pipe* to {pipelines}
    res = phrase_index.search("pipe* models", 10, mode="parse")
    assert _ids(res) == {"b"}
    res = phrase_index.search("trans*", 10, mode="parse")
    assert _ids(res) == {"a", "b", "c", "d", "e", "f", "g"}


def test_prefix_search_distributed_matches_local(phrase_index):
    a = phrase_index.search("s* transformer", 10, mode="parse")
    b = phrase_index.search("s* transformer", 10, mode="parse", prefer_local=False)
    ra = [(r["doc_id"], round(r["score"], 9)) for r in a.collect()]
    rb = [(r["doc_id"], round(r["score"], 9)) for r in b.collect()]
    assert ra == rb and ra  # s* = {state, systems, stopword-free terms...}


def test_prefix_expansion_scores_sum(phrase_index):
    # st* expands to {state, systems}: docs matching several expansion
    # members score the sum (Whoosh Or/UnionMatcher over the expansion)
    grp = {r["doc_id"]: r["score"] for r in
           phrase_index.search("st*", 20, mode="parse").collect()}
    parts = [
        {r["doc_id"]: r["score"] for r in phrase_index.search(t, 20, mode="parse").collect()}
        for t in ("state", "systems")
    ]
    for doc, s in grp.items():
        assert s == pytest.approx(sum(p.get(doc, 0.0) for p in parts), rel=1e-12)


def test_prefix_no_match_empties_conjunction(phrase_index):
    assert phrase_index.search("zzz* models", 10, mode="parse").count() == 0
    assert phrase_index.search("zzz*", 10, mode="parse").count() == 0


def test_prefix_negated(phrase_index):
    # models minus docs with any pipe* term -> drop b
    res = phrase_index.search("models -pipe*", 10, mode="parse")
    assert _ids(res) == {"a", "c", "d", "e"}


def test_wildcard_search(phrase_index):
    # stems present: transform, model, pipelin, state, system, deep...
    # m?del* matches the 'model' stem only
    res = phrase_index.search("m?del* transformer", 10, mode="parse")
    assert _ids(res) == {"a", "b", "c", "d", "e"}
    # leading wildcard: *tate -> {state}
    res = phrase_index.search("*tate", 10, mode="parse")
    assert _ids(res) == {"f", "g"}


def test_wildcard_negated_and_distributed(phrase_index):
    res = phrase_index.search("transformer -p?pel*", 10, mode="parse")
    assert _ids(res) == {"a", "c", "d", "e", "f", "g"}  # b has pipelin
    a = phrase_index.search("m?del* transformer", 10, mode="parse")
    b = phrase_index.search("m?del* transformer", 10, mode="parse", prefer_local=False)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_wildcard_no_match_empties(phrase_index):
    assert phrase_index.search("zz?zz transformer", 10, mode="parse").count() == 0


def test_range_search(phrase_index):
    # stored terms include: art, beat, big, deep, fast, models, older,
    # pipelines, run, state, systems, transformer
    # [deep TO fast] = {deep, fast}: docs c (deep) and d (fast)
    res = phrase_index.search("[deep TO fast]", 10, mode="parse")
    assert _ids(res) == {"c", "d"}
    # conjunction with a required term: models AND [deep TO fast] -> c, d
    res = phrase_index.search("models [deep TO fast]", 10, mode="parse")
    assert _ids(res) == {"c", "d"}


def test_range_exclusive_bounds(phrase_index):
    # {deep TO fast} excludes both bounds -> no stored term inside -> empty
    assert phrase_index.search("{deep TO fast}", 10, mode="parse").count() == 0
    # {big TO fast] = (big, fast] = {deep, fast}
    res = phrase_index.search("{big TO fast]", 10, mode="parse")
    assert _ids(res) == {"c", "d"}


def test_range_open_ended_and_negated(phrase_index):
    # [systems TO] = {systems, transformer}: every doc has transformer
    res = phrase_index.search("[systems TO]", 10, mode="parse")
    assert _ids(res) == {"a", "b", "c", "d", "e", "f", "g"}
    # ranges run over STORED terms with the BOUNDS stemmed too (round-6
    # parity fix: Whoosh's get_single_text runs the filter chain minus
    # the tokenizer on range endpoints): 'pipelines' stems to 'pipelin'
    # on BOTH sides, so the expansion of [pipelines TO state} is
    # {pipelin, run} and docs b and d drop
    got = _ids(phrase_index.search("transformer NOT [pipelines TO state}", 10, mode="parse"))
    assert got == {"a", "c", "e", "f", "g"}


def test_range_search_distributed_matches_local(phrase_index):
    a = phrase_index.search("models [deep TO fast]", 10, mode="parse")
    b = phrase_index.search("models [deep TO fast]", 10, mode="parse", prefer_local=False)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_negated_phrase_on_positionless_index_raises(spark, tmp_path):
    corpus = spark.createDataFrame([("a", "alpha beta gamma")], "doc_id string, content string")
    idx_dir = str(tmp_path / "nopos2")
    cfg = EngineConfig(
        index=IndexConfig(n_buckets=2, bucket_groups=1, chunk_docs=64, encode_partitions=2)
    )
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=cfg)
    with pytest.raises(ValueError, match="store_positions"):
        BM25Index(spark, idx_dir).search('alpha NOT "beta gamma"', 10, mode="parse")


def test_phrase_on_positionless_index_raises(spark, tmp_path):
    corpus = spark.createDataFrame([("a", "alpha beta gamma")], "doc_id string, content string")
    idx_dir = str(tmp_path / "nopos")
    cfg = EngineConfig(
        index=IndexConfig(n_buckets=2, bucket_groups=1, chunk_docs=64, encode_partitions=2)
    )
    build_index(spark, corpus, idx_dir, fields={"body": "content"}, cfg=cfg)
    with pytest.raises(ValueError, match="store_positions"):
        BM25Index(spark, idx_dir).search('"alpha beta"', 10, mode="parse")


def test_parse_boost_recorded():
    pq = parse_query("spark^2 scan^0.5 flink", S)
    assert pq.terms == ["spark", "scan", "flink"]  # no spurious '2'/'0'/'5'
    assert pq.boosts == {"spark": 2.0, "scan": 0.5}  # round 4: applied, not dropped


def test_parse_andnot_maps_to_not():
    pq = parse_query("spark ANDNOT shuffle", S)
    assert pq.terms == ["spark"]
    assert pq.excluded == ["shuffle"]


def test_parse_andmaybe_optional_term_scores_only():
    # Whoosh AndMaybe: b never gates; round 4 keeps it as a score-only
    # operand (result set still equals dropping it)
    pq = parse_query("spark ANDMAYBE flink scan", S)
    assert pq.terms == ["spark", "scan"]
    assert pq.maybe_terms == ["flink"]
    assert pq.excluded == []


def test_parse_require_gates_without_scoring():
    # Whoosh Require: scan must match but only spark scores (round 4)
    pq = parse_query("spark REQUIRE scan", S)
    assert pq.terms == ["spark"]
    assert pq.filter_terms == ["scan"]
    assert pq.mode == "and"


def test_parse_simple_paren_or_group_works():
    # '(a OR b) c': parens stripped by the tokenizer; infix OR still
    # binds the adjacent terms -> And(Or(a,b), c)
    pq = parse_query("(spark OR flink) scan", S)
    assert pq.groups == [["spark", "flink"], ["scan"]]
    assert pq.mode == "group"


def test_expansion_cap_raises(phrase_index, monkeypatch):
    # Lucene TooManyClauses analog: an expansion beyond MAX_EXPANSION
    # raises rather than silently truncating results
    monkeypatch.setattr(type(phrase_index), "MAX_EXPANSION", 2, raising=True)
    with pytest.raises(ValueError, match="expansion matches"):
        phrase_index.search("[art TO transformer] models", 10, mode="parse")
    # a 2-term expansion still fits
    res = phrase_index.search("[deep TO fast]", 10, mode="parse")
    assert res.count() > 0


from hypothesis import given, settings
from hypothesis import strategies as st

_QUERY_ALPHABET = st.sampled_from(
    list("abc xyz") + ['"', "*", "?", "[", "]", "{", "}", ":", "-", "^", "("]
    + [" OR ", " AND ", " NOT ", " TO ", "title:", '"big data"', "tr*", "[a TO b]"]
    + [" ANDMAYBE ", " REQUIRE ", "^2.5", "^0.5"]
)


@given(st.lists(_QUERY_ALPHABET, max_size=12).map("".join))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_and_invariants_hold(q):
    pq = parse_query(q, S, fields={"title", "body"})
    # scoring terms are covered exactly by clauses + tree leaves (no
    # tree: clauses alone; tree: leaves own the structure, clauses are
    # AND-side gates whose terms are still scoring terms).  Duplicate
    # singleton clauses from repeated input tokens are allowed — the
    # kernel intersects them away and scores each term once.
    clause_terms = [t for c in pq.groups for t in c]
    assert set(pq.terms) == set(clause_terms) | set(tree_terms(pq.tree))
    # no duplicates WITHIN a clause
    for c in pq.groups:
        assert len(c) == len(set(c))
    # mode is consistent with the clause/tree structure
    if pq.tree is not None:
        assert pq.mode == "group"
    if pq.mode == "and":
        assert all(len(c) == 1 for c in pq.groups)
    if pq.mode == "or":
        assert len(pq.groups) == 1 and not pq.phrases and not pq.excluded_phrases
    # fielded maps only scoring / maybe / filter terms; the three term
    # roles never overlap (a scored term wins over its modifier twin)
    assert set(pq.fielded) <= set(pq.terms) | set(pq.maybe_terms) | set(pq.filter_terms)
    assert not set(pq.terms) & set(pq.maybe_terms)
    assert not set(pq.terms) & set(pq.filter_terms)
    assert set(pq.boosts) <= set(pq.terms) | set(pq.maybe_terms)


def test_nasty_queries_dont_crash_search(phrase_index):
    for q in [
        '"unclosed phrase', "NOT", "-", "*", "?", "^", "title:", ":",
        "[ TO ]", "[a TO", "NOT -", '""', '"" OR', "( OR )", "a^b",
        'NOT "', "--x", "title:*", "[z TO a]",  # inverted range: no terms
        "ANDMAYBE", "REQUIRE", "alpha REQUIRE", "ANDMAYBE alpha",
        "REQUIRE beta", "alpha ANDMAYBE -beta", "alpha^ beta", "^2",
        "* OR", "OR *", "* OR *", "* OR the", "* OR alpha OR", "(a OR *",
    ]:
        df = phrase_index.search(q, 5, mode="parse")
        assert df.count() >= 0  # parses + executes (possibly empty)


def test_parse_phrase_slop_routes_to_slop_phrases():
    # "a b"~N (Whoosh slop syntax): integer N >= 2 switches to sloppy
    # matching; the suffix never leaks a numeric term either way
    pq = parse_query('"big data"~2 scan', S)
    assert pq.phrases == []
    assert pq.slop_phrases == [([("big", 0), ("data", 1)], 2)]
    assert set(pq.terms) == {"big", "data", "scan"}
    assert pq.mode == "and"
    pq = parse_query('spark NOT "big data"~3', S)
    assert pq.excluded_slop_phrases == [([("big", 0), ("data", 1)], 3)]
    assert pq.excluded_phrases == []
    assert pq.terms == ["spark"]


def test_parse_phrase_slop_one_and_junk_stay_exact():
    # ~1 IS exact adjacency (Whoosh mindist=1 == slop=1); ~0 and a
    # fractional suffix degrade to the exact path, suffix consumed
    for suffix in ("~1", "~0", "~1.5"):
        pq = parse_query(f'"big data"{suffix}', S)
        assert pq.phrases == [[("big", 0), ("data", 1)]]
        assert pq.slop_phrases == []
        assert set(pq.terms) == {"big", "data"}
    # ~2.5 reads its integer prefix (Whoosh's regex stops at the dot)
    pq = parse_query('"big data"~2.5', S)
    assert pq.slop_phrases == [([("big", 0), ("data", 1)], 2)]


# ---------------- sloppy phrases ("a b"~N, Whoosh SpanNear2) ----------------


def test_slop_phrase_widens_to_gap_docs(phrase_index):
    # exact: a, d, e (e's stopword leaves no gap after renumbering).
    # slop 2 adds c ("transformer deep models": 'deep' is a KEPT word,
    # so its gap SURVIVES renumbering — gap 2)
    exact = phrase_index.search('"transformer models"', 10, mode="parse")
    assert _ids(exact) == {"a", "d", "e"}
    sloppy = phrase_index.search('"transformer models"~2', 10, mode="parse")
    assert _ids(sloppy) == {"a", "c", "d", "e"}
    # b stays out at any slop: wrong order (SpanNear2 ordered=True)
    assert _ids(phrase_index.search('"transformer models"~9', 10, mode="parse")) == {
        "a", "c", "d", "e"
    }


def test_slop_phrase_gap_boundary(phrase_index):
    # the [1, slop] window is tight on both sides over RENUMBERED
    # positions: slop 1 == exact adjacency ({a,d,e}); c's kept-word gap
    # of 2 needs slop 2; stopword-derived gaps no longer exist, so
    # "state art"~2 matches both f and g identically
    assert _ids(phrase_index.search('"transformer models"~1', 10, mode="parse")) == {
        "a", "d", "e"
    }
    assert _ids(phrase_index.search('"state art"~2', 10, mode="parse")) == {"f", "g"}


def test_slop_phrase_distributed_matches_local(phrase_index):
    loc = phrase_index.search('"transformer models"~2', 10, mode="parse")
    dist = phrase_index.search(
        '"transformer models"~2', 10, mode="parse", prefer_local=False
    )
    assert [(r["doc_id"], round(r["score"], 9)) for r in loc.collect()] == [
        (r["doc_id"], round(r["score"], 9)) for r in dist.collect()
    ]


def test_slop_phrase_scores_are_plain_bm25_over_members(phrase_index):
    # slop phrases gate; scoring stays BM25F over the member terms —
    # matching docs score identically to the bare AND query
    sloppy = {r["doc_id"]: r["score"] for r in
              phrase_index.search('"transformer models"~2', 10, mode="parse").collect()}
    bare = {r["doc_id"]: r["score"] for r in
            phrase_index.search("transformer models", 10, mode="parse").collect()}
    assert set(sloppy) <= set(bare)
    for doc, s in sloppy.items():
        assert s == pytest.approx(bare[doc], rel=1e-12)


def test_negated_slop_phrase(phrase_index):
    # drop docs where the sloppy phrase matches; keep the rest
    res = phrase_index.search('transformer NOT "transformer models"~2', 10, mode="parse")
    assert _ids(res) == {"b", "f", "g"}


def test_slop_phrase_composes_with_terms_and_not(phrase_index):
    # sloppy phrase + required term + NOT in one query
    res = phrase_index.search('"transformer models"~2 deep', 10, mode="parse")
    assert _ids(res) == {"c"}
    res = phrase_index.search('"transformer models"~2 NOT deep', 10, mode="parse")
    assert _ids(res) == {"a", "d", "e"}


# ---------------------------------------------------------------------------
# field:(...) groups — Whoosh FieldsPlugin distribution (round 5)

FG = {"title", "body"}


def test_field_group_distributes_over_or():
    pq = parse_query("title:(spark OR flink) scan", S, fields=FG)
    assert pq.mode == "group"
    assert pq.groups == [["spark", "flink"], ["scan"]]
    assert pq.fielded == {"spark": "title", "flink": "title"}


def test_field_group_distributes_over_and():
    pq = parse_query("title:(a1 b1)", S, fields=FG)
    assert pq.terms == ["a1", "b1"]
    assert pq.mode == "and"
    assert pq.fielded == {"a1": "title", "b1": "title"}


def test_field_group_innermost_field_wins():
    # Whoosh: an inner fieldname overrides the group's
    pq = parse_query("title:(a1 body:b1)", S, fields=FG)
    assert pq.fielded == {"a1": "title", "b1": "body"}


def test_field_group_negation_drops_field():
    # -x distributes to -title:x, then the documented NOT-field
    # simplification excludes globally
    pq = parse_query("title:(a1 -b1)", S, fields=FG)
    assert pq.terms == ["a1"] and pq.excluded == ["b1"]
    assert pq.fielded == {"a1": "title"}


def test_field_group_unknown_field_degrades():
    # zzz isn't an index field: text untouched, degrades like plain parens
    pq = parse_query("zzz:(a1 b1)", S, fields=FG)
    assert pq.fielded == {}
    assert set(pq.terms) == {"zzz", "a1", "b1"}


def test_field_group_not_before_group_stays_out():
    # NOT binding a group is out of the subset — same degrade as NOT (a b)
    pq = parse_query("scan NOT title:(a1 b1)", S, fields=FG)
    assert pq.fielded == {}
    assert pq.excluded == ["a1"] and set(pq.terms) == {"scan", "b1"}


def test_field_group_phrase_and_boost_members():
    pq = parse_query('title:("big data" x1^2)', S, fields=FG)
    assert pq.phrases == [[("big", 0), ("data", 1)]]
    assert pq.fielded == {"x1": "title"}
    assert pq.boosts == {"x1": 2.0}


def test_field_group_expansion_members():
    pq = parse_query("title:(tr* [aa TO bb])", S, fields=FG)
    assert pq.prefixes == ["tr"] and pq.prefix_fields == {"tr": "title"}
    assert pq.ranges == [
        __import__(
            "beetle_search_engine_spark.plans.parser", fromlist=["TermRange"]
        ).TermRange(lo="aa", hi="bb", lo_incl=True, hi_incl=True, field="title")
    ]


def test_field_group_empty_body_vanishes():
    pq = parse_query("title:() scan", S, fields=FG)
    assert pq.terms == ["scan"]


def test_field_group_feeds_nested_tree():
    # the distributed form can itself be a nested tree; tree leaves keep
    # their field restriction
    pq = parse_query("title:(a1 b1) OR scan", S, fields=FG)
    assert pq.tree == (
        "or",
        (("and", (("term", "a1"), ("term", "b1"))), ("term", "scan")),
    )
    assert pq.fielded == {"a1": "title", "b1": "title"}


def test_flat_loop_paren_glued_field_and_boost():
    # regression (round 5): the flat path used to mis-read "(title:a"
    # (spurious 'title' term, lost field) and "b^2)" (lost boost)
    pq = parse_query("(title:spark OR flink^2) scan", S, fields=FG)
    assert "title" not in pq.terms
    assert pq.fielded == {"spark": "title"}
    assert pq.boosts == {"flink": 2.0}


# ---------------------------------------------------------------------------
# '*' match-all — Whoosh EveryPlugin (round 5)


def test_every_star_alone():
    pq = parse_query("*", S, fields=FG)
    assert pq.every and not pq.empty and pq.terms == []


def test_every_with_not_terms():
    pq = parse_query("* NOT spark -scan", S, fields=FG)
    assert pq.every and pq.excluded == ["spark", "scan"]


def test_every_with_positive_drops_star():
    # And(Every, t) ranks identically to t — the star is dropped
    pq = parse_query("* spark", S, fields=FG)
    assert not pq.every and pq.terms == ["spark"]


def test_every_with_negated_phrase_degrades():
    # phrase negation beside '*' stays out of the subset: today's
    # no-positive-content empty parse is preserved
    pq = parse_query('* NOT "big data"', S, fields=FG)
    assert not pq.every and pq.empty


def test_parse_single_quoted_text_degrades_to_terms():
    # SingleQuotePlugin divergence (documented in the module docstring):
    # Whoosh would emit the verbatim Term("spark table"), unmatchable on
    # an analyzed text field; here the quotes strip and the content
    # parses as plain required terms.  Single-word quotes are identical
    # to Whoosh either way.
    pq = parse_query("'spark table' scan", S)
    assert set(pq.terms) == {"spark", "table", "scan"}
    assert pq.phrases == []
    pq1 = parse_query("'spark' scan", S)
    assert set(pq1.terms) == {"spark", "scan"}


def test_every_or_chain_sets_every_or():
    # '* OR x' is Or(Every, x): every live doc matches, x adds its score
    pq = parse_query("* OR spark", S, fields=FG)
    assert pq.every_or and not pq.every
    assert pq.every_rest == "spark" and pq.terms == ["spark"]
    # trailing star and longer chains too
    pq = parse_query("spark OR *", S, fields=FG)
    assert pq.every_or and pq.every_rest == "spark"
    pq = parse_query("spark OR * OR scan", S, fields=FG)
    assert pq.every_or and pq.every_rest == "spark OR scan"
    assert pq.mode == "or" or pq.groups  # the rest is a disjunction


def test_every_or_star_with_stopwords_is_every():
    pq = parse_query("* OR the", S, fields=FG)
    assert pq.every and not pq.every_or


def test_every_or_chain_guards():
    # adjacency / modifiers / quotes break the chain: star drops (the
    # documented divergence), never a bogus every_or
    assert not parse_query("* OR spark scan", S, fields=FG).every_or
    assert not parse_query("* OR NOT spark", S, fields=FG).every_or
    assert not parse_query('* OR "big data"', S, fields=FG).every_or


def test_unbalanced_open_paren_degrades_to_flat():
    # unclosed group at end-of-query keeps the flat reading, matching
    # the documented _build_tree contract (stray ')' already did)
    pq = parse_query("(alpha beta) OR (gamma delta", S)
    assert pq.tree is None
    pq2 = parse_query("(alpha beta) OR (gamma delta)", S)
    assert pq2.tree is not None


def test_malformed_boost_degrades_not_crashes():
    # '[\d.]+' used to hand '.' / '1.2.3' to float() -> ValueError on
    # raw user input; invalid float suffixes now fall through to the
    # analyzer like any other junk
    for q in ["ab^.", "ab^1.2.3", "ab^", "(ab^. cd) OR ef"]:
        pq = parse_query(q, S)  # must not raise
        assert "ab" in pq.terms, q
    pq = parse_query("ab^2.5", S)
    assert pq.boosts.get("ab") == 2.5


def test_cannot_is_not_a_negation():
    # _RANGE's NOT alternative needs a word boundary: 'CANNOT [a TO b]'
    # must not negate the range and leak 'CAN' as a term
    pq = parse_query("cannot [aa TO ab]", S)
    assert not pq.excluded_ranges and pq.ranges
    pq2 = parse_query("CANNOT [aa TO ab]", S)
    assert not pq2.excluded_ranges and pq2.ranges
    # a real NOT still negates
    pq3 = parse_query("x NOT [aa TO ab]", S)
    assert pq3.excluded_ranges and not pq3.ranges


def test_andmaybe_phrase_operand_is_set_correct():
    # Whoosh AndMaybe(x, phrase) matches x's docs; the dangling-keyword
    # path used to make the phrase REQUIRED.  Degradation: keyword +
    # phrase drop together (documented score divergence).
    pq = parse_query('spark ANDMAYBE "big data"', S)
    assert pq.terms == ["spark"]
    assert not pq.phrases and not pq.maybe_terms
    # ...and the keyword must not bind to an unrelated LATER word
    pq2 = parse_query('spark ANDMAYBE "big data" scan', S)
    assert set(pq2.terms) == {"spark", "scan"}
    assert not pq2.maybe_terms  # 'scan' stays required


def test_require_phrase_operand_keeps_phrase_required():
    # Whoosh Require(x, phrase): docs match both (scored by x only);
    # here the phrase stays a required positional constraint (members
    # also score — documented divergence), and no dangling keyword binds
    pq = parse_query('spark REQUIRE "big data"', S)
    assert pq.phrases == [[("big", 0), ("data", 1)]]
    assert "spark" in pq.terms and not pq.filter_terms


def test_andmaybe_range_operand_drops():
    pq = parse_query("spark ANDMAYBE [aa TO ab]", S)
    assert pq.terms == ["spark"] and not pq.ranges


# ------- round-6 Whoosh-default parity fixes (parser review pass) -------


def test_and_binds_tighter_than_or():
    """Whoosh's OperatorsPlugin applies And before Or: 'a OR b AND c' is
    Or(a, And(b, c)) — an alpha-only doc matches."""
    pq = parse_query("alpha OR beta AND gamma", S)
    assert pq.tree == ("or", (("term", "alpha"),
                              ("and", (("term", "beta"), ("term", "gamma")))))
    pq2 = parse_query("alpha AND beta OR gamma", S)
    assert pq2.tree == ("or", (("and", (("term", "alpha"), ("term", "beta"))),
                               ("term", "gamma")))


def test_or_spent_by_stopword():
    """Whoosh binds the OR to the stopword node and NullQuery-normalizes
    it away: 'alpha OR the beta' == And(alpha, beta), beta REQUIRED."""
    pq = parse_query("alpha OR the beta", S)
    assert pq.tree is None and pq.mode == "and"
    assert sorted(pq.terms) == ["alpha", "beta"]
    assert pq.groups == [] or all(len(g) == 1 for g in pq.groups)


def test_multitoken_word_joins_or_as_and_unit():
    """multitoken_query='default': 'alpha OR data-base' is
    Or(alpha, And(data, base)), so an alpha-only doc matches."""
    pq = parse_query("alpha OR data-base", S)
    assert pq.tree == ("or", (("term", "alpha"),
                              ("and", (("term", "data"), ("term", "base")))))


def test_phrase_boost_consumed_and_applied():
    """'"big data"^25' boosts the phrase (members), never leaks a
    required term '25' (BoostPlugin attaches to the phrase node)."""
    pq = parse_query('"big data"^25', S)
    assert sorted(pq.terms) == ["big", "data"]
    assert pq.boosts == {"big": 25.0, "data": 25.0}
    pq2 = parse_query('"big data"~2^3', S)
    assert "3" not in pq2.terms and pq2.boosts == {"big": 3.0, "data": 3.0}


def test_group_boost_applies_to_all_members():
    """'(alpha beta)^2' boosts BOTH members (Whoosh boosts the group
    node); composes multiplicatively with member boosts."""
    pq = parse_query("(alpha beta)^2 gamma", S)
    assert pq.boosts == {"alpha": 2.0, "beta": 2.0}
    assert sorted(pq.terms) == ["alpha", "beta", "gamma"]
    assert parse_query("(alpha^2 beta)^3", S).boosts == {"alpha": 6.0, "beta": 3.0}


def test_range_lowercase_to_and_stemmed_bounds():
    """Whoosh's RangePlugin accepts lowercase 'to', and range endpoints
    run the no-tokenize filter chain (lowercase + stem)."""
    pq = parse_query("[alpha to beta]", S)
    assert len(pq.ranges) == 1 and (pq.ranges[0].lo, pq.ranges[0].hi) == ("alpha", "beta")
    assert pq.terms == []
    stemmed = parse_query("[running TO trees]", W).ranges[0]
    assert (stemmed.lo, stemmed.hi) == ("run", "tree")


def test_range_boost_suffix_consumed():
    """'[a TO b]^25 rest' must not leak '25' as a required term (the
    boost is consumed; recording it is a documented degradation)."""
    pq = parse_query("[alpha to beta]^25 table", S)
    assert len(pq.ranges) == 1 and (pq.ranges[0].lo, pq.ranges[0].hi) == ("alpha", "beta")
    assert pq.terms == ["table"]
    # same leak through the ANDMAYBE/REQUIRE strip patterns
    pq = parse_query('ANDMAYBE "big data"^25 table', S)
    assert pq.terms == ["table"] and "25" not in pq.terms
    pq = parse_query("ANDMAYBE [alpha to beta]^2.5 table", S)
    assert pq.terms == ["table"]

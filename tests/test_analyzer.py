"""Golden tests for the analysis chain (SURVEY.md §5.2.1).

Stemmer pairs come from the published Porter sample vocabulary/output and
the worked examples in the paper itself; everything downstream (index,
oracle) depends on these semantics.
"""

from beetle_search_engine_spark.functions import STOP_WORDS, analyze, analyze_query
from beetle_search_engine_spark.functions.analyzer import sql_tokenize
from beetle_search_engine_spark.functions.porter import stem

GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "failing": "fail", "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # misc / short words untouched
    "a": "a", "is": "is", "be": "be", "ow": "ow",
    # initial-y handling
    "yellow": "yellow", "year": "year",
    # code-ish tokens (the graft corpus is source code)
    "models": "model", "transformers": "transform", "searching": "search",
    "indexes": "index", "queries": "queri",
}


def test_porter_golden():
    bad = {w: (stem(w), want) for w, want in GOLDEN.items() if stem(w) != want}
    assert not bad, f"stemmer mismatches: {bad}"


def test_tokenizer_interior_dots_and_unicode():
    # RegexTokenizer \w+(\.?\w+)* keeps interior dots as one token
    assert analyze("pi is 3.14 and ab.cd stands") == ["pi", "3.14", "ab.cd", "stand"]
    # trailing/leading dots are not interior
    assert analyze("end. .start") == ["end", "start"]
    # unicode \w
    assert "café" in analyze("café")[0] or analyze("café") == ["café"]


def test_stop_and_minsize():
    # stopwords removed pre-stem; single chars removed (minsize=2)
    assert analyze("the a an x transformer") == ["transform"]
    assert "when" in STOP_WORDS and "us" in STOP_WORDS
    # stop check happens before stemming: 'this' stops out, 'thesis' does not
    assert analyze("this thesis") == ["thesi"]


def test_query_analysis_dedups_preserving_order():
    assert analyze_query("transformer models transformer") == ["transform", "model"]


def test_reference_smoke_query_terms():
    # the reference's own smoke query (search_bm25.py:48)
    assert analyze_query("transformer models") == ["transform", "model"]


def test_sql_tokenize_matches_reduced_chain():
    assert sql_tokenize("The a Scan x2 scan.filter") == ["scan", "x2", "scan.filter"]


def test_whoosh_filter_order_tokenize_then_lowercase():
    """Whoosh tokenizes the ORIGINAL text and lowercases per token.
    'İ'.lower() adds a combining mark (U+0307); tokenizing the original
    keeps one token, while a lower-first shortcut could move boundaries.
    Golden-pins the per-token ordering (ADVICE round 1)."""
    assert analyze("İstanbul Straße CAFÉ") == ["i̇stanbul", "straße", "café"]
    # positions renumber over KEPT tokens (Whoosh StopFilter
    # renumber=True): the dropped stopword 'The' leaves no gap
    from beetle_search_engine_spark.functions.analyzer import get_analyzer

    assert get_analyzer("whoosh").analyze_pos("The İstanbul") == [("i̇stanbul", 0)]

"""Text analysis chain — index-time == query-time, by construction.

Replicates the semantics the reference gets from Whoosh's
``StemmingAnalyzer`` (reference: src/index/build_bm25.py:11-12, declared a
second time at src/search/search_bm25.py:11-12):

    RegexTokenizer(r"\\w+(\\.?\\w+)*")   -- unicode \\w, keeps interior dots
  | LowercaseFilter
  | StopFilter(STOP_WORDS, minsize=2)  -- stop check happens on the
                                          lowercase, *unstemmed* token
  | StemFilter(porter)

SURVEY.md §2.3 T1-T4.  One shared implementation feeds the Spark pandas
UDFs, the pure-Python BM25F oracle (tests/oracle.py) and the golden tests,
which is what makes "rank-identical" checkable.

``SQL_TOKEN_PATTERN`` is the reduced, SQL-expressible chain (no stemming,
ASCII classes) used only for the DuckDB-comparable driver queries; the
engine's real chain is :func:`analyze`.
"""

from __future__ import annotations

import re
from collections import Counter

from .porter import stem

# Whoosh's default STOP_WORDS (public constant in whoosh.analysis):
STOP_WORDS = frozenset(
    (
        "a", "an", "and", "are", "as", "at", "be", "by", "can", "for",
        "from", "have", "if", "in", "is", "it", "may", "not", "of", "on",
        "or", "tbd", "that", "the", "this", "to", "us", "we", "when",
        "will", "with", "yet", "you", "your",
    )
)

MIN_TOKEN_SIZE = 2  # StopFilter(minsize=2): tokens shorter than 2 dropped

# RegexTokenizer default expression; non-capturing group so findall returns
# whole tokens. re.UNICODE is the default for str patterns in py3.
TOKEN_PATTERN = re.compile(r"\w+(?:\.?\w+)*", re.UNICODE)

# Reduced chain for DuckDB-parity queries: Java regex (Spark) and RE2
# (DuckDB) both treat \w as ASCII, so spell the ASCII class explicitly and
# run it on lower(text).
SQL_TOKEN_PATTERN = r"[a-z0-9_]+(?:\.[a-z0-9_]+)*"

# Zipf makes a term->stem memo almost perfectly effective; executors keep
# one per process (module global survives across Arrow batches).
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 100_000


def _cached_stem(token: str) -> str:
    s = _STEM_CACHE.get(token)
    if s is None:
        s = stem(token)
        if len(_STEM_CACHE) < _STEM_CACHE_MAX:
            _STEM_CACHE[token] = s
    return s


def analyze(text: str) -> list[str]:
    """Full T1-T4 chain: text -> stemmed index terms (order preserved)."""
    if not text:
        return []
    out = []
    for tok in TOKEN_PATTERN.findall(text.lower()):
        if len(tok) < MIN_TOKEN_SIZE or tok in STOP_WORDS:
            continue
        out.append(_cached_stem(tok))
    return out


def analyze_tf(text: str) -> Counter:
    """T1-T4 then term-frequency aggregation (SURVEY.md A1, done in the
    UDF to cut explode volume)."""
    return Counter(analyze(text))


def analyze_query(query: str) -> list[str]:
    """Query-side analysis: same chain, duplicate terms collapsed with
    first-seen order kept (Whoosh's AndGroup treats repeated terms as one
    required term; reference: src/search/search_bm25.py:32-33)."""
    seen: dict[str, None] = {}
    for t in analyze(query):
        seen.setdefault(t)
    return list(seen)


def sql_tokenize(text: str) -> list[str]:
    """The reduced SQL-parity chain (lower -> ASCII tokens -> stop/minsize),
    for tests of the DuckDB-comparable queries."""
    if not text:
        return []
    return [
        t
        for t in re.findall(SQL_TOKEN_PATTERN, text.lower())
        if len(t) >= MIN_TOKEN_SIZE and t not in STOP_WORDS
    ]

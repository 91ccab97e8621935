"""Text analysis chain — index-time == query-time, by construction.

Replicates the semantics the reference gets from Whoosh's
``StemmingAnalyzer`` (reference: src/index/build_bm25.py:11-12, declared a
second time at src/search/search_bm25.py:11-12):

    RegexTokenizer(r"\\w+(\\.?\\w+)*")   -- unicode \\w, keeps interior dots
  | LowercaseFilter                     -- applied PER TOKEN, after
                                           tokenizing (Whoosh filter order;
                                           matters for e.g. 'İ' whose
                                           lowercase adds a combining mark)
  | StopFilter(STOP_WORDS, minsize=2)   -- stop check happens on the
                                           lowercase, *unstemmed* token
  | StemFilter(porter)

SURVEY.md §2.3 T1-T4.  One shared implementation feeds the Spark pandas
UDFs, the pure-Python BM25F oracle (tests/oracle.py) and the golden tests,
which is what makes "rank-identical" checkable.

The chain is configurable via named :class:`Analyzer` presets
(``EngineConfig.analyzer``, recorded in the index's stats.json so query
time always analyzes with the chain the index was built with):

* ``"whoosh"`` — the full reference chain above (default).
* ``"sql"``    — the reduced, ANSI-SQL-expressible chain (lowercase whole
  text first — ASCII-safe shortcut — ASCII word regex, stop/minsize, NO
  stemming).  An index built with this preset is end-to-end reproducible
  by a DuckDB oracle, which is how the full build→WAND→top-k pipeline
  gets a driver-green correctness row.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

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

# Java regex twin of TOKEN_PATTERN; (?U) switches \w to unicode classes to
# match Python re's default.
JVM_TOKEN_PATTERN = r"(?U)\w+(?:\.?\w+)*"

# Reduced chain for DuckDB-parity paths: Java regex (Spark) and RE2
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


@dataclass(frozen=True)
class Analyzer:
    """A named, serializable-by-name analysis chain.

    ``lower_first`` lowercases the whole text before tokenizing — only
    valid when the pattern is ASCII (the SQL chain), where it cannot move
    token boundaries; the Whoosh chain tokenizes the original text and
    lowercases per token, matching Whoosh's filter order.
    """

    name: str
    pattern: re.Pattern = field(repr=False)
    jvm_pattern: str
    do_stem: bool
    lower_first: bool

    def analyze(self, text: str) -> list[str]:
        """Tokenize -> lowercase -> stop/minsize [-> stem]; order kept.

        Kept as a separate tight loop from :meth:`analyze_pos` (no tuple
        per token) because this is the per-document hot path of the
        python tokenizer; the golden fixtures, jvm-parity and phrase
        property tests pin the two implementations to each other."""
        if not text:
            return []
        if self.lower_first:
            toks = self.pattern.findall(text.lower())
        else:
            toks = [t.lower() for t in self.pattern.findall(text)]
        out = []
        for tok in toks:
            if len(tok) < MIN_TOKEN_SIZE or tok in STOP_WORDS:
                continue
            out.append(_cached_stem(tok) if self.do_stem else tok)
        return out

    def analyze_tf(self, text: str) -> Counter:
        """Chain then term-frequency aggregation (SURVEY.md A1, done in
        the UDF to cut explode volume)."""
        return Counter(self.analyze(text))

    def analyze_pos(self, text: str) -> list[tuple[str, int]]:
        """(term, position) pairs with positions RENUMBERED over the
        kept tokens — Whoosh's StopFilter defaults to ``renumber=True``
        (whoosh/analysis/filters.py: the first kept token retains its
        raw position, every later kept token is numbered consecutively
        from it), so a Whoosh phrase DOES match across a removed
        stopword/minsize gap.  We number kept tokens from 0 instead of
        from the first kept raw position; the per-(doc, field) constant
        offset cancels in every adjacency/slop DIFFERENCE the phrase
        operators test, so matching is bit-identical to Whoosh while the
        stored ints stay dense.  (Round 6 fix: positions previously
        indexed the pre-filter stream, which silently REJECTED phrases
        the reference engine matches — e.g. 'table the scan' vs the
        query '"table scan"'.)"""
        if not text:
            return []
        if self.lower_first:
            toks = self.pattern.findall(text.lower())
        else:
            toks = [t.lower() for t in self.pattern.findall(text)]
        out = []
        for tok in toks:
            if len(tok) < MIN_TOKEN_SIZE or tok in STOP_WORDS:
                continue
            out.append((_cached_stem(tok) if self.do_stem else tok, len(out)))
        return out

    def analyze_single(self, text: str) -> str:
        """Whoosh's ``get_single_text`` analog: run the filter chain
        WITHOUT tokenizing (lowercase + stem; stop/minsize never drop —
        StopFilter is called with removestops=False on this path).  Used
        for term-range endpoints (whoosh/qparser/common.py
        get_single_text -> field.process_text(tokenize=False))."""
        t = text.lower()
        return _cached_stem(t) if self.do_stem else t

    def analyze_query(self, query: str) -> list[str]:
        """Query-side analysis: same chain, duplicate terms collapsed with
        first-seen order kept (Whoosh's AndGroup treats repeated terms as
        one required term; reference: src/search/search_bm25.py:32-33)."""
        seen: dict[str, None] = {}
        for t in self.analyze(query):
            seen.setdefault(t)
        return list(seen)


ANALYZERS: dict[str, Analyzer] = {
    "whoosh": Analyzer(
        name="whoosh",
        pattern=TOKEN_PATTERN,
        jvm_pattern=JVM_TOKEN_PATTERN,
        do_stem=True,
        lower_first=False,
    ),
    "sql": Analyzer(
        name="sql",
        pattern=re.compile(SQL_TOKEN_PATTERN),
        jvm_pattern=SQL_TOKEN_PATTERN,
        do_stem=False,
        lower_first=True,
    ),
}


def get_analyzer(name: str) -> Analyzer:
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer preset {name!r} (have {sorted(ANALYZERS)})") from None


_WHOOSH = ANALYZERS["whoosh"]


def analyze(text: str) -> list[str]:
    """Full T1-T4 chain: text -> stemmed index terms (order preserved)."""
    return _WHOOSH.analyze(text)


def analyze_tf(text: str) -> Counter:
    return _WHOOSH.analyze_tf(text)


def analyze_query(query: str) -> list[str]:
    return _WHOOSH.analyze_query(query)


def sql_tokenize(text: str) -> list[str]:
    """The reduced SQL-parity chain (lower -> ASCII tokens -> stop/minsize),
    for tests of the DuckDB-comparable queries."""
    return ANALYZERS["sql"].analyze(text)

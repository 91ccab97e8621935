"""Query-string parser — the engine analog of the reference's Whoosh
``MultifieldParser(["title", "body_text"])`` (reference:
src/search/search_bm25.py:32-33, exposed raw to API users at app.py:28-33).

Supported grammar (a deliberate, documented subset of Whoosh's):

* bare terms            — required (Whoosh's default AndGroup: every term
                          must match in >=1 field)
* ``OR`` (uppercase)    — switches the whole query to disjunctive
                          scoring (any term may match); Whoosh's infix Or
                          group, flattened
* ``AND`` (uppercase)   — explicit no-op (conjunctive is the default)
* ``"quoted phrase"``   — terms must appear consecutively, in order,
                          within one field (needs an index built with
                          store_positions=True).  A phrase forces
                          conjunctive mode: its terms are required, and
                          Whoosh's Phrase node is likewise an AND-side
                          constraint.
* ``field:term``        — restricts that term to one index field
                          (Whoosh's FieldsPlugin); the prefix must name a
                          field the index was built with, otherwise the
                          whole token degrades to plain text (the
                          analyzer strips the ':'), matching how Whoosh
                          treats unknown field names as text.
* ``NOT term`` / ``-term`` — excluded term (Whoosh's AndNot): any doc
                          containing it in ANY field is dropped from the
                          results; excluded terms never contribute to
                          scores.  ``NOT field:x`` excludes x globally (a
                          documented simplification).  ``-term`` is a
                          convenience extension (Whoosh needs its
                          non-default PlusMinusPlugin for it).

Terms pass through the same analyzer chain as indexing (each phrase is
analyzed as a unit, so stop words drop out of phrases exactly as Whoosh's
analyzer-driven Phrase construction does).  Remaining unsupported Whoosh
syntax (ranges, wildcards) is treated as plain text — the analyzer strips
the punctuation — which matches how a stripped-down parser degrades
rather than erroring on user input.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.analyzer import Analyzer

_QUOTED = re.compile(r'"([^"]*)"')
_FIELD_PREFIX = re.compile(r"^(\w+):(.+)$")


@dataclass(frozen=True)
class ParsedQuery:
    terms: list[str]                  # all scoring terms, deduped, order kept
    mode: str                         # "and" | "or"
    # each phrase is [(term, offset)] with offsets = tokenizer positions
    # relative to the phrase's first kept token; a stopword inside a
    # quoted phrase therefore contributes a position *gap* that matching
    # docs must reproduce — exactly Whoosh's pre-filter position semantics
    phrases: list[list[tuple[str, int]]] = field(default_factory=list)
    fielded: dict[str, str] = field(default_factory=dict)  # term -> field
    excluded: list[str] = field(default_factory=list)      # NOT terms

    @property
    def empty(self) -> bool:
        return not self.terms


def parse_query(query: str, analyzer: Analyzer, fields: set[str] | None = None) -> ParsedQuery:
    """Parse a raw user query into (terms, mode, phrases, fielded,
    excluded).  ``fields``: the index's field names — a ``field:`` prefix
    is only honored when it names one of them."""
    phrases: list[list[tuple[str, int]]] = []
    singles: list[str] = []  # single-term "phrases" degrade to plain terms

    def grab(m: re.Match) -> str:
        p = analyzer.analyze_pos(m.group(1))
        if len(p) >= 2:
            base = p[0][1]
            phrases.append([(t, i - base) for t, i in p])
        elif p:
            singles.append(p[0][0])  # already analyzed — don't re-stem
        return " "

    rest = _QUOTED.sub(grab, query)

    mode = "and"
    bare_terms: list[str] = []
    fielded: dict[str, str] = {}
    excluded: list[str] = []
    pending_not = False
    for word in rest.split():
        if word == "OR":
            mode = "or"
            continue
        if word == "AND":
            continue
        if word == "NOT":
            pending_not = True  # binds to the next term
            continue
        neg = pending_not
        pending_not = False
        if word.startswith("-") and len(word) > 1:
            neg = True
            word = word[1:]
        if word.endswith(":") and fields and word[:-1] in fields:
            # a field prefix whose quoted phrase was already extracted
            # (title:"big data" -> phrase + dangling 'title:'); phrases
            # match per-field anyway, so the qualifier drops rather than
            # becoming a spurious required term 'title'
            continue
        fld = None
        m = _FIELD_PREFIX.match(word)
        if m and fields and m.group(1) in fields:
            fld, word = m.group(1), m.group(2)
        for t in analyzer.analyze(word):
            if neg:
                excluded.append(t)
            else:
                bare_terms.append(t)
                if fld is not None:
                    fielded[t] = fld

    seen: dict[str, None] = {}
    for t in bare_terms + singles:
        seen.setdefault(t)
    for p in phrases:
        for t, _off in p:
            seen.setdefault(t)

    if phrases:
        mode = "and"  # a phrase is a conjunctive constraint
    ex_seen: dict[str, None] = {}
    for t in excluded:
        ex_seen.setdefault(t)
    return ParsedQuery(
        terms=list(seen), mode=mode, phrases=phrases,
        fielded=fielded, excluded=list(ex_seen),
    )

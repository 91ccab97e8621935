"""Query-string parser — the engine analog of the reference's Whoosh
``MultifieldParser(["title", "body_text"])`` (reference:
src/search/search_bm25.py:32-33, exposed raw to API users at app.py:28-33).

Supported grammar (a deliberate, documented subset of Whoosh's):

* bare terms            — required (Whoosh's default AndGroup: every term
                          must match in >=1 field)
* ``OR`` (uppercase)    — Whoosh's *infix* Or operator under the default
                          AndGroup: it groups the immediately adjacent
                          terms, so ``x OR y z`` parses as
                          ``And(Or(x, y), z)`` — z stays required while
                          either x or y satisfies the group.  Consecutive
                          ORs chain (``x OR y OR z w`` ->
                          ``And(Or(x,y,z), w)``).  A doc matching several
                          group members scores the sum of the matching
                          members (Whoosh's UnionMatcher).
* ``AND`` (uppercase)   — explicit no-op (conjunctive is the default)
* ``"quoted phrase"``   — terms must appear consecutively, in order,
                          within one field (needs an index built with
                          store_positions=True).  A phrase is always an
                          AND-side constraint (Whoosh's Phrase node);
                          ``"a b" OR x`` degrades to the phrase required
                          plus x handled by the surrounding grammar — the
                          phrase never joins an OR group (documented
                          simplification of Whoosh's Or(Phrase, x)).
* ``"a b"~N``           — sloppy phrase (round 5): integer N >= 2
                          relaxes matching to Whoosh's SpanNear2
                          semantics (``Phrase.matcher`` builds
                          ``SpanNear2(terms, slop=N, ordered=True,
                          mindist=1)``): surviving terms in order with
                          every consecutive positional gap in [1, N] —
                          query-side stopword offsets are NOT reproduced
                          on this path.  ``~1`` / ``~0`` / a fractional
                          suffix keep exact adjacency (Whoosh's plugin
                          regex accepts only [1-9][0-9]*; the integer
                          prefix of ``~2.5`` reads as 2).  Composes with
                          NOT (``NOT "a b"~2`` drops sloppy matches).
* ``field:term``        — restricts that term to one index field
                          (Whoosh's FieldsPlugin); the prefix must name a
                          field the index was built with, otherwise the
                          whole token degrades to plain text (the
                          analyzer strips the ':'), matching how Whoosh
                          treats unknown field names as text.  Fielded
                          terms participate in OR groups normally.
* ``field:(a b)``       — fielded group (Whoosh FieldsPlugin): the
                          prefix distributes over every enclosed leaf
                          (``title:(a OR b) c`` == ``(title:a OR
                          title:b) c``; works inside nested trees, with
                          boosts, phrases, expansions, and ranges in
                          their existing ``field:X`` spellings).  An
                          inner ``otherfield:x`` wins (innermost
                          fieldname applies, as in Whoosh); an unknown
                          field, nested parens in the body, or a
                          NOT/ANDNOT directly before the group keep the
                          text untouched and degrade as before.
* ``( ... )``           — parenthesized boolean groups.  Flat shapes
                          (``(a OR b) c`` == And(Or(a,b), c)) keep the
                          long-proven flat clause model.  NESTED trees
                          (``(a b) OR (c d)`` == Or(And(a,b), And(c,d)),
                          arbitrary depth) parse into a recursive tree
                          (round 5) evaluated with Whoosh's matcher
                          semantics: And sums all children, Or sums only
                          the MATCHING children — a doc matching branch
                          (a b) but not (c d) scores a+b even when c is
                          present.  Tree terms may carry field prefixes
                          and boosts; top-level NOT / ANDMAYBE / REQUIRE
                          / phrases / expansions compose beside the tree
                          as AND-side constraints.  Out of the subset —
                          a modifier or expansion INSIDE a group, a
                          phrase or range interleaved with parens, or
                          unbalanced parens — degrades to the paren-free
                          flat reading (documented).
* ``term^2.5``          — query-time boost (Whoosh's boost attribute):
                          the term's BM25F contributions are multiplied
                          by the factor, in every kernel incl. WAND
                          (block-max bounds scale with it, so pruning
                          stays sound).  Repeated occurrences follow
                          Whoosh's ``Query.normalize()`` exactly (round
                          5): duplicate nodes collapse (``a a`` == a,
                          ``a^2 a^2`` == a^2) while distinct-boost nodes
                          all score — the effective multiplier is the
                          SUM of the term's distinct boost values
                          (``a^2 a^3`` -> x5, ``a a^3`` -> x4).  Boosts
                          on prefix/wildcard/range expansions and
                          phrases are recognized and discarded.
* ``a ANDNOT b``        — mapped to ``a NOT b`` (identical semantics).
* ``a ANDMAYBE b``      — Whoosh AndMaybe: b never gates candidacy but
                          ADDS its score where present (UnionMatcher on
                          the scoring side only).  ``b^2`` keeps its
                          boost.  An ANDMAYBE'd expansion (``pre*``)
                          is dropped (result set identical, boost
                          lost — documented).
* ``a REQUIRE b``       — Whoosh Require: b is a required FILTER — docs
                          must contain it, but only a scores.  A
                          REQUIRE'd expansion degrades to a plain
                          scored OR group (documented).
* ``NOT term`` / ``-term`` — excluded term (Whoosh's AndNot): any doc
                          containing it in ANY field is dropped from the
                          results; excluded terms never contribute to
                          scores.  ``NOT field:x`` excludes x globally (a
                          documented simplification).  ``-term`` is a
                          convenience extension (Whoosh needs its
                          non-default PlusMinusPlugin for it).  An OR
                          immediately before a NOT term is dropped
                          (Whoosh's Or(x, Not(y)) has no clean AndNot
                          reading; documented simplification).
* ``NOT "a b"`` / ``-"a b"`` — excluded phrase: docs containing the
                          phrase (same per-field positional adjacency as
                          positive phrases) are dropped.  ``NOT
                          field:"a b"`` excludes the phrase globally,
                          mirroring the NOT field:term simplification.
* ``pre*``              — prefix query (Whoosh's PrefixPlugin / the
                          trailing-star case of WildcardPlugin): matches
                          docs containing ANY indexed term starting with
                          the prefix; every matching term scores
                          (Whoosh expands a Prefix to an Or over the
                          term dictionary).  The prefix is lowercased
                          but NOT stemmed/stop-filtered — wildcard
                          tokens bypass text analysis in Whoosh too, and
                          expansion happens against the index's STORED
                          (= already analyzed) terms at query time.
                          Needs >=2 chars before the star, else the
                          token degrades to plain text (a 1-char prefix
                          is a vocabulary scan, not a query).
                          ``field:pre*`` restricts every expansion to
                          that field; ``NOT pre*`` / ``-pre*`` excludes
                          all matching terms.  A prefix never joins an
                          OR group (documented simplification, same as
                          phrases).

* ``[a TO b]``          — term range (Whoosh's RangePlugin / TermRange):
                          matches docs containing ANY stored term
                          lexicographically within the bounds; like a
                          prefix it expands into an OR group at query
                          time and every matching term scores.  ``{a TO
                          b}`` excludes the bounds (mixed brackets
                          allowed); an omitted bound is open-ended
                          (``[a TO]``); ``field:[a TO b]`` restricts
                          the expansion to one field; ``NOT [a TO b]``
                          / ``-[a TO b]`` excludes every matching term.
                          Bounds are lowercased but not analyzed (the
                          expansion runs against stored terms), same
                          policy as prefixes.

* ``te?t`` / ``t*st``   — general wildcards (Whoosh's WildcardPlugin,
                          in its default plugin set): ``*`` = any run,
                          ``?`` = one char, anywhere in the token.
                          Expanded like prefixes — the literal prefix
                          before the first wildcard prunes the
                          dictionary walk; a leading-wildcard pattern
                          (``*ing``) is a full dictionary scan, the
                          same cost Whoosh pays.  Requires >=2 literal
                          characters in the pattern, else plain text.
                          Field restriction and NOT compose as with
                          prefixes.

* ``*``                 — match-all (Whoosh's EveryPlugin, in the
                          default plugin set): a standalone star matches
                          EVERY live (non-tombstoned) document at
                          constant score 1.0 — Whoosh's ``Every`` query.
                          Term negations compose (``* NOT x`` ==
                          ``AndNot(Every, x)``; ``-x`` likewise).  Any
                          other company degrades by DROPPING the star:
                          ``And(Every, t)`` matches exactly ``t``'s docs
                          and adds the same +1.0 to every candidate, so
                          the ranking is identical and only the constant
                          offset is lost (documented).  Negated phrases
                          or expansions beside ``*`` keep today's
                          no-positive-content empty result.

Terms pass through the same analyzer chain as indexing (each phrase is
analyzed as a unit, so stop words drop out of phrases exactly as Whoosh's
analyzer-driven Phrase construction does).  Remaining unsupported Whoosh
syntax (fuzzy ``term~`` — Whoosh's FuzzyTermPlugin is NOT in the default
plugin set, so the reference never exposes it) is treated as plain text —
the analyzer strips the punctuation — which matches how a stripped-down
parser degrades rather than erroring on user input.

Single quotes (Whoosh's SingleQuotePlugin, in the default set) are a
deliberate divergence: Whoosh turns ``'a b'`` into the verbatim term
``Term("a b")``, which on an ANALYZED text field (the only field kind
this engine indexes — the reference schema is all TEXT, build_bm25.py)
can never match a posting and silently returns nothing.  Here the
analyzer strips the quotes and the content parses as plain terms —
strictly more useful on analyzed fields, and identical to Whoosh
whenever the quoted text is a single word.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from ..functions.analyzer import Analyzer

# the optional ^B boost suffix is CONSUMED (Whoosh BoostPlugin attaches
# it to the preceding phrase node) and applied to the phrase's member
# terms — without consuming it, '"big data"^25' leaked a REQUIRED term
# '25' into the query (round-6 parity fix).  Member-boost application is
# an approximation of Whoosh's Phrase-node boost (the members are also
# this engine's phrase scorers, so x B lands on the same contributions).
_QUOTED = re.compile(r'"([^"]*)"(?:~([\d.]+))?(?:\^(\d+\.?\d*|\.\d+))?')
# NOT "a b" / -"a b" / NOT title:"a b": extracted before positive phrases
# so the quoted body never reaches the positive-phrase grab.  The
# optional ~N slop suffix (Whoosh PhrasePlugin syntax): an integer
# N >= 2 switches the phrase to Whoosh's sloppy matching (SpanNear2:
# ordered terms, consecutive gaps in [1, N] — see wand._slop_phrase_mask
# for the divergence note vs the exact path's offset reproduction);
# N <= 1 or a non-integer suffix keeps exact adjacency (Whoosh's
# PhrasePlugin regex only accepts [1-9][0-9]*, and slop=1 IS exact).
# Either way the suffix is consumed — without that the analyzer would
# leak a spurious numeric term.
_NEG_QUOTED = re.compile(r'(?:\bNOT\s+|(?<!\S)-)(\w+:)?"([^"]*)"(?:~([\d.]+))?(?:\^(\d+\.?\d*|\.\d+))?')
_FIELD_PREFIX = re.compile(r"^(\w+):(.+)$")
# [a TO b] / {a TO b] / title:[a TO b] / NOT [a TO b] / -[a TO b];
# either bound may be omitted (open range) — extracted before the word
# loop because the body contains a space
# only VALID float literals match ('2', '2.5', '.5', '5.') — a permissive
# [\d.]+ would hand '.' or '1.2.3' to float() and crash parse_query on
# raw user input, violating the degrade-never-error contract; unmatched
# suffixes fall through to the analyzer and degrade like any other junk
_BOOST = re.compile(r"^(.+?)\^(\d+\.?\d*|\.\d+)$")  # term^2.5 -> (term, 2.5)
_RANGE = re.compile(
    # (?<!\S) on NOT: without the boundary, any word ENDING in 'NOT'
    # (CANNOT) would negate a following range and leak its stem ('CAN')
    # as a required term
    # [Tt][Oo]: Whoosh's RangePlugin expr accepts lowercase 'to'
    # (whoosh/qparser/plugins.py) — '[alpha to beta]' is a range, not
    # two required terms (round-6 parity fix)
    # trailing (?:\^...)? CONSUMES a boost suffix ('[a TO b]^25') so the
    # number can never leak into the word loop as a required term '25'
    # (round-7 ADVICE fix).  The boost itself is dropped — a documented
    # degradation (Whoosh would boost every expanded member); consuming
    # without recording is set-correct, leaking is not.
    r"(?:(?<!\S)(NOT)\s+|(?<!\S)(-))?(?:(\w+):)?([\[\{])\s*(\w+)?\s+[Tt][Oo](?:\s+(\w+))?\s*([\]\}])"
    r"(?:\^(?:\d+\.?\d*|\.\d+))?"
)


@dataclass(frozen=True)
class TermRange:
    """One ``[a TO b]`` clause: stored-term bounds (lowercased, possibly
    None = open) with per-side inclusivity, plus an optional field
    restriction for the expansion."""
    lo: str | None
    hi: str | None
    lo_incl: bool
    hi_incl: bool
    field: str | None = None


@dataclass(frozen=True)
class ParsedQuery:
    terms: list[str]                  # all scoring terms, deduped, order kept
    mode: str                         # "and" | "or" | "group"
    # each phrase is [(term, offset)] with offsets = RENUMBERED kept-token
    # positions relative to the phrase's first kept token; Whoosh's
    # StopFilter renumbers (renumber=True default), so a stopword inside a
    # quoted phrase contributes NO gap — the kept neighbors must be
    # adjacent in the doc's (equally renumbered) position stream
    phrases: list[list[tuple[str, int]]] = field(default_factory=list)
    # term -> field.  DOCUMENTED DIVERGENCE: one entry per TERM, so
    # 'title:spark body:spark' collapses to the last field (Whoosh keeps
    # two distinct Term nodes requiring spark in BOTH fields) and
    # per-field boosts on the same term sum; per-OCCURRENCE clauses need
    # a structural refactor of this dataclass — revisit if fielded
    # duplicate terms show up in real query logs.  A fielded phrase
    # 'title:"big data"' likewise drops its field restriction (the
    # phrase matches in any field).
    fielded: dict[str, str] = field(default_factory=dict)  # term -> field
    excluded: list[str] = field(default_factory=list)      # NOT terms
    # conjunctive clause list (mode "group"): each clause is a list of
    # terms; singleton = required term, len>=2 = OR group (>=1 member
    # must match; every matching member scores).  Together the clauses
    # are Whoosh's And([...Or(...)...]) tree, flattened one level —
    # covers every scoring term exactly once.
    groups: list[list[str]] = field(default_factory=list)
    # NOT "a b": docs containing the phrase are dropped (same positional
    # semantics as `phrases`; requires store_positions)
    excluded_phrases: list[list[tuple[str, int]]] = field(default_factory=list)
    # "a b"~N with integer N >= 2: (members, slop) pairs matched with
    # Whoosh SpanNear2 semantics (ordered, consecutive gaps in [1, N])
    # instead of exact offset reproduction; members score like phrase
    # members.  Negated twins gate without scoring.
    slop_phrases: list[tuple[list[tuple[str, int]], int]] = field(default_factory=list)
    excluded_slop_phrases: list[tuple[list[tuple[str, int]], int]] = field(default_factory=list)
    # pre*: lowercased prefixes to expand against the index's stored
    # term dictionary at query time; each expansion becomes one OR-group
    # clause (Whoosh Prefix == Or over matching terms)
    prefixes: list[str] = field(default_factory=list)
    excluded_prefixes: list[str] = field(default_factory=list)
    prefix_fields: dict[str, str] = field(default_factory=dict)  # prefix -> field
    # [a TO b] clauses, expanded like prefixes (TermRange == Or over the
    # stored terms within the bounds)
    ranges: list[TermRange] = field(default_factory=list)
    excluded_ranges: list[TermRange] = field(default_factory=list)
    # general * / ? patterns (lowercased), expanded like prefixes
    wildcards: list[str] = field(default_factory=list)
    excluded_wildcards: list[str] = field(default_factory=list)
    wildcard_fields: dict[str, str] = field(default_factory=dict)
    # term^2.5 -> query-time score multiplier (Whoosh boost).  Effective
    # multiplier = SUM of the term's DISTINCT boost values — Whoosh's
    # Query.normalize() semantics (duplicate nodes collapse, distinct-
    # boost nodes all score): a^2 a^3 -> 5.0, a a^3 -> 4.0, a a -> 1.0.
    # Expansions (prefix/wildcard/range) ignore boosts, as before.
    boosts: dict[str, float] = field(default_factory=dict)
    # ANDMAYBE operands: never gate candidacy, score where present
    # (Whoosh AndMaybe — result SET equals dropping them, scores don't)
    maybe_terms: list[str] = field(default_factory=list)
    # REQUIRE operands: gate candidacy, never score (Whoosh Require)
    filter_terms: list[str] = field(default_factory=list)
    # nested boolean tree (round 5): set ONLY when parentheses produce a
    # structure the flat clause model cannot express — e.g. ``(a b) OR
    # (c d)`` == Or(And(a,b), And(c,d)).  Nodes are immutable tuples:
    # ("term", t) | ("and", (children...)) | ("or", (children...)).
    # Whoosh matcher semantics: And matches when all children match and
    # scores their sum; Or matches when any child matches and scores the
    # sum of the MATCHING children only (UnionMatcher — a doc matching
    # branch (a b) but not (c d) scores a+b even if c is present).
    # When set, ``groups`` holds only the NON-tree AND-side constraints
    # (phrase-member singletons; prefix/range/wildcard expansions are
    # appended later by the planner) and ``mode`` is "group".  Flat
    # paren shapes like ``(a OR b) c`` keep the existing groups model.
    tree: tuple | None = None
    # '*' as the whole positive query (Whoosh EveryPlugin, in the
    # default plugin set): match EVERY live document at constant score
    # 1.0 (Every's matcher weight).  Excluded terms compose ("* NOT x"
    # == AndNot(Every, x)).  A pure top-level OR chain containing a
    # standalone star ("* OR x", "x OR * OR y") sets ``every_or``: the
    # query is Or(Every, rest) — every live doc matches, and docs
    # matching ``every_rest`` add its score to Every's 1.0 (Whoosh union
    # scoring sums matching children).  Any other star company — AND
    # adjacency, quotes, parens, modifiers in the chain — drops the star
    # (for adjacency And(Every, t) is ranking-identical to t, the
    # +1.0 shift cancels; for the mixed shapes this is a DOCUMENTED
    # DIVERGENCE: Whoosh would keep the star inside the boolean tree).
    every: bool = False
    every_or: bool = False            # query is Or(Every, every_rest)
    every_rest: str = ""              # raw remainder to search and +1.0

    @property
    def empty(self) -> bool:
        return not (
            self.every or self.terms or self.prefixes or self.ranges or self.wildcards
        )


def tree_terms(node: tuple | None) -> list[str]:
    """Deduped leaf terms of a boolean tree, document order."""
    out: dict[str, None] = {}

    def walk(n):
        if n[0] == "term":
            out.setdefault(n[1])
        else:
            for c in n[1]:
                walk(c)

    if node is not None:
        walk(node)
    return list(out)


_TREE_ABORT = object()  # sentinel: shape outside the tree subset

# field:( ... ) — Whoosh's FieldsPlugin group syntax.  The body may not
# contain nested parens (degrade to the existing paren handling).  A
# preceding '-' or 'NOT ' keeps the match from firing (negated groups
# stay out of the subset, same as NOT (a b)).
_FIELD_GROUP = re.compile(r"(?<![-\w])(\w+):\(([^()]*)\)")
# body tokens: quoted phrase (with optional ~slop / ^boost suffixes),
# bracketed range (contains spaces), or any non-space run
_FG_TOKEN = re.compile(r'"[^"]*"(?:~[\d.]+)?(?:\^[\d.]+)?|[\[\{][^\]\}]*[\]\}]|\S+')
_FG_KEYWORDS = frozenset({"OR", "AND", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"})


def _distribute_field_groups(query: str, fields: set[str] | None) -> str:
    """Rewrite Whoosh's fielded-group syntax ``field:(a b "c d" e*)`` by
    distributing the field prefix over every distributable token in the
    group: ``title:(a OR b) c`` -> ``(title:a OR title:b) c``.  This is
    exactly what Whoosh's FieldsPlugin does (it pushes the fieldname of
    a ``fieldname:(...)`` group onto every enclosed leaf), re-expressed
    as a textual pre-pass so the long-proven flat/tree grammar handles
    the rewritten form with zero new kernel code.  Rules:

    * boolean keywords stay bare; an inner ``otherfield:x`` wins over
      the outer prefix (Whoosh: the innermost fieldname applies);
    * ``-x`` distributes as ``-field:x`` (negation then drops the field
      per the documented NOT-field simplification);
    * quoted phrases, prefix/wildcard tokens, and ``[a TO b]`` ranges
      take the prefix in their existing ``field:X`` spellings;
    * an unknown field name, a ``NOT``/``-`` directly before the group,
      or nested parens inside the body leave the text untouched (the
      established degrade paths own those shapes).

    Quote-aware: matches starting inside a quoted phrase never rewrite.
    """
    if not fields or ":(" not in query:
        return query
    # spans of quoted regions — a field:( inside "..." is phrase text
    qspans = [m.span() for m in re.finditer(r'"[^"]*"', query)]

    def _in_quotes(i: int) -> bool:
        return any(a <= i < b for a, b in qspans)

    def repl(m: re.Match) -> str:
        fld, body = m.group(1), m.group(2)
        if fld not in fields or _in_quotes(m.start()):
            return m.group(0)
        # 'NOT title:(...)' — the keyword binds the group; stay out
        pre = query[: m.start()].rstrip()
        if re.search(r"(?:^|[\s(])(?:NOT|ANDNOT)$", pre):
            return m.group(0)
        out = []
        for tok in _FG_TOKEN.findall(body):
            if tok in _FG_KEYWORDS:
                out.append(tok)
            elif tok.startswith("-") and len(tok) > 1:
                inner = tok[1:]
                fm = _FIELD_PREFIX.match(inner)
                out.append(tok if (fm and fm.group(1) in fields) else f"-{fld}:{inner}")
            else:
                fm = _FIELD_PREFIX.match(tok)
                if fm and fm.group(1) in fields:
                    out.append(tok)  # innermost fieldname wins
                else:
                    out.append(f"{fld}:{tok}")
        return "(" + " ".join(out) + ")" if out else " "

    return _FIELD_GROUP.sub(repl, query)


def _build_tree(
    rest: str,
    analyzer: Analyzer,
    fields: set[str] | None,
    boost_sets: dict[str, set],
    fielded: dict[str, str],
) -> tuple | None:
    """Recursive-descent parse of boolean structure over PLAIN
    (possibly fielded/boosted) terms, with Whoosh's OPERATOR PRECEDENCE
    at every nesting level: explicit AND binds before explicit OR, and
    the leftover adjacency becomes the default AndGroup (see _reduce) —
    'a OR b AND c' parses as Or(a, And(b, c)) exactly like Whoosh's
    OperatorsPlugin, and a multi-token word joins an OR as one And unit
    (multitoken_query='default').

    Returns None — meaning "keep the flat reading" — whenever the shape
    leaves the supported subset: unbalanced parens, or a modifier /
    expansion (NOT, -x, ANDMAYBE, REQUIRE, wildcards) INSIDE a group.
    Top-level modifiers are skipped here (the flat pass owns them and
    they compose with the tree as AND-side constraints).  Field
    restrictions and boosts on tree terms register into the shared
    ``fielded``/``boosts`` maps exactly as flat terms do."""
    toks = re.findall(r"\(|\)|[^\s()]+", rest)
    pos = 0

    def _reduce(seq: list[tuple]) -> tuple | None:
        """Apply Whoosh's OperatorsPlugin order to one nesting level:
        EVERY explicit AND binds first, then EVERY explicit OR, then the
        leftover adjacency becomes the default AndGroup — so
        'a OR b AND c' is Or(a, And(b, c)), never And(Or(a, b), c)
        (whoosh/qparser/plugins.py appends (Not, And, Or, ...) and
        do_operators applies them in list order; round-6 parity fix).
        ``seq`` is [(node, sep)] with sep in ('adj', 'and', 'or') = the
        explicit operator BEFORE the node.  A word that analyzed to
        nothing arrives as a ('null',) node and is normalized away
        AFTER operators bind, exactly like Whoosh's NullQuery —
        Or(alpha, the) collapses to alpha, leaving a following word
        REQUIRED rather than inheriting the spent OR."""
        for op in ("and", "or"):
            out: list[tuple] = []
            for node, sep in seq:
                if sep == op and out:
                    prev, psep = out[-1]
                    if prev[0] == op:
                        out[-1] = ((op, prev[1] + (node,)), psep)
                    else:
                        out[-1] = ((op, (prev, node)), psep)
                else:
                    out.append((node, sep if sep != op else "adj"))
            seq = out
        units = []
        for node, _sep in seq:
            node = _strip_null(node)
            if node is not None:
                units.append(node)
        if not units:
            return None
        return units[0] if len(units) == 1 else ("and", tuple(units))

    def parse(depth: int):
        nonlocal pos
        seq: list[tuple] = []  # (node, explicit-operator-before-node)
        sep = "adj"
        closed = False
        while pos < len(toks):
            w = toks[pos]
            node = None
            if w == "(":
                pos += 1
                node = parse(depth + 1)
                if node is _TREE_ABORT:
                    return _TREE_ABORT
                if node is None:
                    sep = "adj"  # empty group: the operator is spent
                    continue
            elif w == ")":
                if depth == 0:
                    return _TREE_ABORT  # unbalanced
                pos += 1
                closed = True
                break
            elif w == "OR":
                pos += 1
                if seq:
                    sep = "or"
                continue
            elif w == "AND":
                pos += 1
                if seq:
                    sep = "and"
                continue
            elif w in ("NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"):
                if depth > 0:
                    return _TREE_ABORT  # no modifiers inside groups
                pos += 1
                if pos < len(toks) and toks[pos] == "(":
                    return _TREE_ABORT  # modifier on a group: flat reading
                pos += 1  # skip the operand — the flat pass owns it
                sep = "adj"
                continue
            elif w.startswith("-") and len(w) > 1:
                if depth > 0:
                    return _TREE_ABORT
                pos += 1
                sep = "adj"
                continue
            elif ("*" in w or "?" in w) and re.fullmatch(r"[\w*?]+", w) and len(
                re.sub(r"[*?]", "", w)
            ) >= 2:
                if depth > 0:
                    return _TREE_ABORT  # expansions never join groups
                pos += 1
                sep = "adj"
                continue
            else:
                pos += 1
                word, bval = w, None
                bm = _BOOST.match(word)
                if bm:
                    word, bval = bm.group(1), float(bm.group(2))
                fld = None
                m = _FIELD_PREFIX.match(word)
                if m and fields and m.group(1) in fields:
                    fld, word = m.group(1), m.group(2)
                ts = analyzer.analyze(word)
                if not ts:
                    # Whoosh parses the stopword into a node, binds
                    # operators, and NullQuery-normalizes it away — keep
                    # a placeholder so the operator is consumed by it
                    node = ("null",)
                else:
                    for t in ts:
                        if fld is not None:
                            fielded[t] = fld
                        boost_sets.setdefault(t, set()).add(
                            bval if bval is not None else 1.0
                        )
                    node = (
                        ("term", ts[0])
                        if len(ts) == 1
                        else ("and", tuple(("term", t) for t in ts))
                    )
            seq.append((node, sep))
            sep = "adj"
        if depth > 0 and not closed:
            return _TREE_ABORT  # unclosed group at EOF: unbalanced,
            # keep the documented flat reading
        return _reduce(seq)

    root = parse(0)
    if root is _TREE_ABORT or root is None:
        return None
    root = _canonical(root)
    return None if _is_flat(root) else root


def _strip_null(node: tuple) -> tuple | None:
    """Whoosh Query.normalize: NullQuery children vanish from And/Or;
    a group of nothing is itself null."""
    if node[0] == "null":
        return None
    if node[0] == "term":
        return node
    kids = [c for c in (_strip_null(k) for k in node[1]) if c is not None]
    if not kids:
        return None
    return kids[0] if len(kids) == 1 else (node[0], tuple(kids))


def _canonical(node: tuple) -> tuple:
    """Flatten same-operator nesting (And-under-And, Or-under-Or) and
    collapse single-child groups — ``((a b) c)`` is just And(a,b,c), so
    it keeps the flat path."""
    if node[0] == "term":
        return node
    kids: list[tuple] = []
    for c in node[1]:
        c = _canonical(c)
        if c[0] == node[0]:
            kids.extend(c[1])
        else:
            kids.append(c)
    return kids[0] if len(kids) == 1 else (node[0], tuple(kids))


def _is_flat(node: tuple) -> bool:
    """True when the tree is expressible by the existing flat
    And-of-(term | Or-of-terms) clause model — keep that model then, so
    long-proven queries take the long-proven path."""
    if node[0] == "term":
        return True
    if node[0] == "or":
        return all(c[0] == "term" for c in node[1])
    return all(
        c[0] == "term" or (c[0] == "or" and all(g[0] == "term" for g in c[1]))
        for c in node[1]
    )


def parse_query(query: str, analyzer: Analyzer, fields: set[str] | None = None) -> ParsedQuery:
    """Parse a raw user query into (terms, mode, phrases, fielded,
    excluded, groups, excluded_phrases).  ``fields``: the index's field
    names — a ``field:`` prefix is only honored when it names one of
    them."""
    query = _distribute_field_groups(query, fields)
    # Whoosh EveryPlugin: a standalone '*' matches every live document
    # (score 1.0).  Term negations compose ('* NOT x' == AndNot(Every,
    # x)); any other company — positive terms, phrases (incl. negated),
    # expansions — drops the star and parses the remainder as before
    # (And(Every, t) is ranking-identical to t; see ParsedQuery.every).
    stripped = query.strip()
    # pure top-level OR chain with a standalone star: unit (OR unit)*
    # where one unit is '*' -> Or(Every, chain-of-the-others).  Quotes,
    # parens and modifier units leave the chain shape and fall through.
    toks = stripped.split()
    if (
        "*" in toks
        and '"' not in stripped and "(" not in stripped and "'" not in stripped
        and len(toks) >= 3 and len(toks) % 2 == 1
        and all(t == "OR" for t in toks[1::2])
        and all(
            t != "OR" and not t.startswith("-")
            and t not in ("NOT", "AND", "ANDNOT", "ANDMAYBE", "REQUIRE")
            for t in toks[0::2]
        )
    ):
        units = [t for t in toks[0::2] if t != "*"]
        rest = " OR ".join(units)
        sub = parse_query(rest, analyzer, fields) if rest else ParsedQuery(terms=[], mode="and")
        if sub.empty:  # '* OR *' / '* OR <stopword>': still match-all
            return replace(sub, every=True)
        return replace(sub, every_or=True, every_rest=rest)
    if stripped == "*" or stripped.startswith("* "):
        rest = stripped[1:].strip()
        sub = parse_query(rest, analyzer, fields) if rest else ParsedQuery(terms=[], mode="and")
        if sub.empty and not (
            sub.phrases or sub.slop_phrases or sub.excluded_phrases
            or sub.excluded_slop_phrases or sub.maybe_terms or sub.filter_terms
            or sub.excluded_prefixes or sub.excluded_ranges or sub.excluded_wildcards
        ):
            return replace(sub, every=True)
        return sub  # star dropped (And(Every, sub) ranking-identity);
        # `rest` is the same text — re-parsing it inline would double
        # the work for an identical result
    phrases: list[list[tuple[str, int]]] = []
    ex_phrases: list[list[tuple[str, int]]] = []
    sl_phrases: list[tuple[list[tuple[str, int]], int]] = []
    ex_sl_phrases: list[tuple[list[tuple[str, int]], int]] = []
    singles: list[str] = []  # single-term "phrases" degrade to plain terms
    ex_singles: list[str] = []  # single-term negated phrases -> NOT terms

    def _slop_of(suffix: str | None) -> int:
        # Whoosh PhrasePlugin: slop is the integer prefix of the digits
        # ("~2.5" reads as 2); anything that doesn't yield an int >= 2
        # keeps the exact path (slop=1 IS exact adjacency)
        try:
            return int((suffix or "1").split(".")[0] or "1")
        except ValueError:
            return 1

    def _analyzed_phrase(
        text: str, out_multi: list, out_single: list, slop: int = 1, out_slop: list | None = None
    ) -> None:
        p = analyzer.analyze_pos(text)
        if len(p) >= 2:
            base = p[0][1]
            members = [(t, i - base) for t, i in p]
            if slop >= 2 and out_slop is not None:
                out_slop.append((members, slop))
            else:
                out_multi.append(members)
        elif p:
            out_single.append(p[0][0])  # already analyzed — don't re-stem

    def grab_neg(m: re.Match) -> str:
        _analyzed_phrase(
            m.group(2), ex_phrases, ex_singles, _slop_of(m.group(3)), ex_sl_phrases
        )
        return " "

    phrase_boosts: list[tuple[str, float]] = []  # member-term boost pairs

    def grab(m: re.Match) -> str:
        before = (len(phrases), len(singles), len(sl_phrases))
        _analyzed_phrase(m.group(1), phrases, singles, _slop_of(m.group(2)), sl_phrases)
        if m.group(3):
            b = float(m.group(3))
            if len(phrases) > before[0]:
                phrase_boosts.extend((t, b) for t, _ in phrases[-1])
            elif len(sl_phrases) > before[2]:
                phrase_boosts.extend((t, b) for t, _ in sl_phrases[-1][0])
            elif len(singles) > before[1]:
                phrase_boosts.append((singles[-1], b))
        return " "

    # ANDMAYBE / REQUIRE whose operand is a quoted phrase or a term
    # range: the operand is extracted by the phrase/range passes below,
    # which would leave the keyword dangling — binding it to an
    # unrelated later word, or (dangling at end) silently making the
    # operand a required scored constraint.  Set-correct degradations on
    # the raw text instead:
    #   * ANDMAYBE <phrase|range>: Whoosh's AndMaybe operand never
    #     affects the match set, so keyword + operand drop together
    #     (documented divergence: the operand's score bonus is lost);
    #   * REQUIRE <phrase|range>: the operand stays a required
    #     phrase/group constraint, only the keyword drops (documented
    #     divergence: Whoosh scores the left side only, here the
    #     operand's members also score).
    # both strip patterns consume a trailing ^boost so 'ANDMAYBE
    # "big data"^25 table' / 'ANDMAYBE [a TO b]^25 table' cannot leave
    # '25' behind as a required term (round-7 ADVICE fix)
    _phr = r'(?:\w+:)?"[^"]*"(?:~[\d.]+)?(?:\^(?:\d+\.?\d*|\.\d+))?'
    _rng = r"(?:\w+:)?[\[\{]\s*\w*\s+[Tt][Oo](?:\s+\w+)?\s*[\]\}](?:\^(?:\d+\.?\d*|\.\d+))?"
    query = re.sub(rf"(?<!\S)ANDMAYBE\s+(?:{_phr}|{_rng})", " ", query)
    query = re.sub(rf"(?<!\S)REQUIRE\s+(?=(?:{_phr}|{_rng}))", " ", query)

    rest = _QUOTED.sub(grab, _NEG_QUOTED.sub(grab_neg, query))

    ranges: list[TermRange] = []
    ex_ranges: list[TermRange] = []

    def grab_range(m: re.Match) -> str:
        neg = bool(m.group(1) or m.group(2))
        f = m.group(3)
        fld = f if (f and fields and f in fields) else None  # unknown field -> global
        # Whoosh passes range endpoints through the filter chain minus
        # the tokenizer (get_single_text -> process_text(tokenize=False):
        # lowercase AND stem, no stop/minsize drop), so '[running TO
        # trees]' becomes TermRange('run', 'tree') against the stemmed
        # dictionary (round-6 parity fix; previously lowercase-only)
        lo = analyzer.analyze_single(m.group(5)) if m.group(5) else None
        hi = analyzer.analyze_single(m.group(6)) if m.group(6) else None
        if lo is None and hi is None:
            return " "  # '[ TO ]' — matches everything, drop as noise
        tr = TermRange(lo, hi, m.group(4) == "[", m.group(7) == "]", fld)
        (ex_ranges if neg else ranges).append(tr)
        return " "

    rest = _RANGE.sub(grab_range, rest)

    # '(alpha beta)^2' boosts EVERY member in Whoosh (BoostPlugin
    # attaches to the preceding GroupNode); distribute onto the words —
    # keeping the parens for the tree pass — instead of letting the
    # trailing 'beta)^2' spelling mis-assign (or, for 1-char words,
    # silently DELETE) the final member (round-6 parity fix).  Innermost
    # groups only: a boost on a group that itself contains groups is a
    # shape this parser's flat fallback already documents as degraded.
    _GROUP_BOOST = re.compile(r"\(([^()]+)\)\^(\d+\.?\d*|\.\d+)")

    def _distribute_group_boost(m: re.Match) -> str:
        b = float(m.group(2))
        out = []
        for w in m.group(1).split():
            if w in ("OR", "AND", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"):
                out.append(w)
                continue
            bm = _BOOST.match(w)
            if bm:
                out.append(f"{bm.group(1)}^{float(bm.group(2)) * b}")
            else:
                out.append(f"{w}^{b}")
        return "(" + " ".join(out) + ")"

    rest = _GROUP_BOOST.sub(_distribute_group_boost, rest)

    clauses: list[list[str]] = []  # conjunctive; each = OR'd member terms
    fielded: dict[str, str] = {}
    excluded: list[str] = []
    prefixes: list[str] = []
    excluded_prefixes: list[str] = []
    prefix_fields: dict[str, str] = {}
    wildcards: list[str] = []
    excluded_wildcards: list[str] = []
    wildcard_fields: dict[str, str] = {}
    boost_sets: dict[str, set] = {}  # per-term DISTINCT boost values
    for _t, _b in phrase_boosts:
        boost_sets.setdefault(_t, set()).add(_b)
    maybe_list: list[str] = []
    filter_list: list[str] = []
    pending_not = False
    pending_maybe = False
    pending_filter = False
    or_pending = False  # an OR was seen after clauses[-1]; the next
    # positive term joins that clause instead of opening a new one
    for word in rest.split():
        # parens carry no meaning on the flat path (precedence is the
        # paren-free reading by definition) but, left glued to a word,
        # they hide its field prefix / boost / wildcard from the
        # matchers below ("(title:a" fails _FIELD_PREFIX and deposits a
        # spurious 'title' term; "b^2)" mis-reads its boost) — the
        # analyzer would strip them anyway, so strip them first
        word = word.strip("()")
        if not word:
            continue  # bare paren: pending modifiers + or_pending carry
        if word == "OR":
            if clauses:  # leading OR has no left operand -> noise
                or_pending = True
            continue
        if word == "AND":
            continue  # conjunctive is the default
        if word == "REQUIRE":
            pending_filter = True  # next term gates but never scores
            continue
        if word in ("NOT", "ANDNOT"):
            pending_not = True  # binds to the next term (ANDNOT == NOT)
            continue
        if word == "ANDMAYBE":
            pending_maybe = True  # next term scores but never gates
            continue
        # NOT overrides either modifier: 'ANDMAYBE NOT x' keeps the NOT
        is_maybe = pending_maybe and not pending_not
        is_filter = pending_filter and not pending_not and not is_maybe
        pending_maybe = pending_filter = False
        neg = pending_not
        pending_not = False
        bval = None
        bm = _BOOST.match(word)
        if bm:
            word, bval = bm.group(1), float(bm.group(2))
        if word.startswith("-") and len(word) > 1:
            neg = True
            word = word[1:]
        if word.endswith(":") and fields and word[:-1] in fields:
            # a field prefix whose quoted phrase was already extracted
            # (title:"big data" -> phrase + dangling 'title:'); phrases
            # match per-field anyway, so the qualifier drops rather than
            # becoming a spurious required term 'title'.  (A NOT before
            # the phrase is consumed by the negated-phrase extraction,
            # so no negation is lost here.)
            continue
        fld = None
        m = _FIELD_PREFIX.match(word)
        if m and fields and m.group(1) in fields:
            fld, word = m.group(1), m.group(2)
        if ("*" in word or "?" in word) and re.fullmatch(r"[\w*?]+", word):
            lit_count = len(re.sub(r"[*?]", "", word))
            if lit_count >= 2:  # <2 literal chars = dictionary scan, not a query
                if is_maybe:
                    # ANDMAYBE expansion: dropping it preserves the result
                    # set exactly (pre-round-4 ANDMAYBE behavior); a
                    # REQUIRE expansion degrades to a plain scored
                    # OR-group (documented)
                    continue
                base = word.lower()  # wildcard tokens bypass analysis
                if base.endswith("*") and not re.search(r"[*?]", base[:-1]):
                    # pure trailing star -> the cheap prefix fast path
                    base = base[:-1]
                    if neg:
                        excluded_prefixes.append(base)
                    else:
                        prefixes.append(base)
                        if fld is not None:
                            prefix_fields[base] = fld
                elif neg:
                    excluded_wildcards.append(base)
                else:
                    wildcards.append(base)
                    if fld is not None:
                        wildcard_fields[base] = fld
                or_pending = False  # an expansion never joins an OR group
                continue
            # else fall through: the analyzer strips the stars
        toks = analyzer.analyze(word)
        if neg:
            excluded.extend(toks)
            or_pending = False  # Or(x, Not(y)) simplified away: the OR drops
            continue
        if is_maybe or is_filter:
            # ANDMAYBE/REQUIRE operands never join clauses or OR groups
            for t in toks:
                (maybe_list if is_maybe else filter_list).append(t)
                if fld is not None:
                    fielded[t] = fld
                boost_sets.setdefault(t, set()).add(
                    bval if bval is not None else 1.0
                )  # boosted optional term keeps its boost
            if toks:
                or_pending = False
            continue
        for j, t in enumerate(toks):
            if j == 0 and or_pending:
                if t not in clauses[-1]:
                    clauses[-1].append(t)
                or_pending = False
            else:
                clauses.append([t])
            if fld is not None:
                fielded[t] = fld
            boost_sets.setdefault(t, set()).add(bval if bval is not None else 1.0)
        # any positive word consumes a pending OR — INCLUDING one that
        # analyzed to nothing: Whoosh binds the OR to the stopword node
        # and Or(x, NullQuery).normalize() == x, so the next word is
        # REQUIRED, never an inherited OR member (round-6 parity fix)
        or_pending = False

    excluded = excluded + ex_singles

    # nested boolean trees: attempted only when parens are present and no
    # phrase/range was extracted from inside them (a quoted phrase or
    # [a TO b] interleaved with parens has no reliable position left in
    # ``rest``, so the flat reading stands — documented).  A successful
    # NESTED parse replaces the word-derived clauses: the tree owns the
    # scoring terms' structure; phrase singletons and planner-appended
    # expansions stay AND-side constraints beside it.
    tree = None
    if ("(" in rest or re.search(r"(?<!\S)OR(?!\S)", rest)) and not (
        phrases or ex_phrases or sl_phrases or ex_sl_phrases
        or singles or ex_singles or ranges or ex_ranges
    ):
        _tb: dict[str, set] = {}
        _tf: dict[str, str] = {}
        tree = _build_tree(rest, analyzer, fields, _tb, _tf)
        if tree is not None:
            # the tree pass tokenizes paren-adjacent words CLEANLY (the
            # flat loop sees "(alpha^2" / "alpha^3)" with punctuation
            # attached and mis-reads boosts/fields there), so for tree
            # leaves the tree-derived boost/field info is authoritative
            for _t in tree_terms(tree):
                boost_sets[_t] = _tb.get(_t, {1.0})
                if _t in _tf:
                    fielded[_t] = _tf[_t]
                elif _t in fielded:
                    del fielded[_t]
    if tree is not None:
        clauses = []

    # singles (degraded 1-term phrases) and phrase member terms become
    # required singleton clauses unless already covered by a clause
    seen: dict[str, None] = {}
    for t in tree_terms(tree):
        seen.setdefault(t)
    for c in clauses:
        for t in c:
            seen.setdefault(t)
    for t in singles:
        if t not in seen:
            clauses.append([t])
            seen.setdefault(t)
    for p in phrases:
        for t, _off in p:
            if t not in seen:
                clauses.append([t])
                seen.setdefault(t)
    for p, _slop in sl_phrases:
        for t, _off in p:
            if t not in seen:
                clauses.append([t])
                seen.setdefault(t)

    terms = list(seen)

    # effective boost per term = SUM of its DISTINCT boost values —
    # Whoosh's Query.normalize() semantics: duplicate nodes collapse
    # (``a a`` == a; ``a^2 a^2`` == a^2) while distinct-boost nodes all
    # score (``a^2 a^3`` -> x5, ``a a^3`` -> x4).  Restricted to terms
    # that can actually score (query terms + ANDMAYBE operands): the
    # flat loop's paren-adjacent misreads can deposit boost values under
    # tokens that never became terms.
    _maybe_set = set(maybe_list)
    boosts = {}
    for _t, _vals in boost_sets.items():
        if _t not in seen and _t not in _maybe_set:
            continue
        _eff = sum(_vals)
        if _eff != 1.0:
            boosts[_t] = _eff

    has_group = any(len(c) > 1 for c in clauses)
    if tree is not None:
        mode = "group"  # tree queries run the conjunctive-kernel family
    elif not has_group:
        mode = "and"
    elif (
        len(clauses) == 1 and not phrases and not ex_phrases
        and not sl_phrases and not ex_sl_phrases
        and not maybe_list and not filter_list
    ):
        mode = "or"  # pure disjunction -> block-max WAND path
    else:
        # And over clauses, >=1 a real OR group; also the route for
        # OR groups mixed with ANDMAYBE/REQUIRE operands (the
        # conjunctive kernel is the one that honors them)
        mode = "group"
    ex_seen: dict[str, None] = {}
    for t in excluded:
        ex_seen.setdefault(t)
    pfx_seen: dict[str, None] = {}
    for p in prefixes:
        pfx_seen.setdefault(p)
    return ParsedQuery(
        terms=terms, mode=mode, phrases=phrases,
        fielded=fielded, excluded=list(ex_seen),
        groups=clauses, excluded_phrases=ex_phrases,
        slop_phrases=sl_phrases, excluded_slop_phrases=ex_sl_phrases,
        prefixes=list(pfx_seen), excluded_prefixes=excluded_prefixes,
        prefix_fields=prefix_fields,
        ranges=ranges, excluded_ranges=ex_ranges,
        wildcards=list(dict.fromkeys(wildcards)),
        excluded_wildcards=excluded_wildcards, wildcard_fields=wildcard_fields,
        boosts=boosts,
        maybe_terms=list(dict.fromkeys(t for t in maybe_list if t not in seen)),
        filter_terms=list(dict.fromkeys(t for t in filter_list if t not in seen)),
        tree=tree,
    )

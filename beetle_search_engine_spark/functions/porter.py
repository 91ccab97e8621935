"""Porter stemmer (Porter, 1980 — "An algorithm for suffix stripping").

Implemented from the published algorithm description and the points of
departure documented on the author's public page (step 2 uses bli->ble
rather than the paper's abli->able, and adds logi->log), which is what the
Whoosh StemFilter's default stemmer implements; the reference delegates to
it via StemmingAnalyzer (reference: src/index/build_bm25.py:11-12 and
src/search/search_bm25.py:11-12).  This module is the single stemming
implementation shared by the Spark engine, the pure-Python BM25F oracle,
and the golden tests, so index-time and query-time analysis are identical
by construction — the property "rank-identical top-k" depends on.

Pure stdlib; safe to ship to executors inside a pandas UDF.  Callers should
memoize (Zipf: a small cache eliminates nearly all calls) — see
analyzer.py.
"""

from __future__ import annotations

import re

# Word-shape classes (per the algorithm definition):
#   a *consonant* is a letter other than a,e,i,o,u and other than y when
#   preceded by a consonant.  The regex encoding below (consonant sequence
#   starts with [^aeiou], continues with [^aeiouy]) captures the positional
#   y rule for sequences; an initial y is handled by the Y-marker swap in
#   stem().
_c = "[^aeiou]"          # consonant
_v = "[aeiouy]"          # vowel
_C = _c + "[^aeiouy]*"   # consonant sequence
_V = _v + "[aeiou]*"     # vowel sequence

_mgr0 = re.compile("^(" + _C + ")?" + _V + _C)                      # m > 0
_meq1 = re.compile("^(" + _C + ")?" + _V + _C + "(" + _V + ")?$")   # m == 1
_mgr1 = re.compile("^(" + _C + ")?" + _V + _C + _V + _C)            # m > 1
_s_v = re.compile("^(" + _C + ")?" + _v)                            # has vowel
_cvc = re.compile("^" + _C + _v + "[^aeiouwxy]$")                   # *o rule

_step1a_1 = re.compile(r"^(.+?)(ss|i)es$")
_step1a_2 = re.compile(r"^(.+?)([^s])s$")
_step1b_eed = re.compile(r"^(.+?)eed$")
_step1b_eding = re.compile(r"^(.+?)(ed|ing)$")
_at_bl_iz = re.compile(r"(at|bl|iz)$")
_double_c = re.compile(r"([^aeiouylsz])\1$")
_step1c = re.compile(r"^(.+?)y$")

_STEP2 = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent", "eli": "e",
    "ousli": "ous", "ization": "ize", "ation": "ate", "ator": "ate",
    "alism": "al", "iveness": "ive", "fulness": "ful", "ousness": "ous",
    "aliti": "al", "iviti": "ive", "biliti": "ble", "logi": "log",
}
_step2 = re.compile("^(.+?)(" + "|".join(sorted(_STEP2, key=len, reverse=True)) + ")$")

_STEP3 = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic",
    "ical": "ic", "ful": "", "ness": "",
}
_step3 = re.compile("^(.+?)(" + "|".join(sorted(_STEP3, key=len, reverse=True)) + ")$")

_step4_1 = re.compile(
    r"^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate"
    r"|iti|ous|ive|ize)$"
)
_step4_2 = re.compile(r"^(.+?)(s|t)(ion)$")
_step5 = re.compile(r"^(.+?)e$")
_step5_ll = re.compile(r"ll$")


def stem(w: str) -> str:
    """Return the Porter stem of a lowercase word."""
    if len(w) < 3:
        return w

    first_y = w[0] == "y"
    if first_y:
        # mark initial y as a consonant (uppercase falls outside every
        # vowel class used above)
        w = "Y" + w[1:]

    # ---- step 1a: plurals
    m = _step1a_1.match(w)
    if m:
        w = m.group(1) + m.group(2)
    else:
        m = _step1a_2.match(w)
        if m:
            w = m.group(1) + m.group(2)

    # ---- step 1b: -eed / -ed / -ing
    m = _step1b_eed.match(w)
    if m:
        if _mgr0.match(m.group(1)):
            w = w[:-1]
    else:
        m = _step1b_eding.match(w)
        if m:
            s = m.group(1)
            if _s_v.match(s):
                w = s
                if _at_bl_iz.search(w):
                    w += "e"
                elif _double_c.search(w):
                    w = w[:-1]
                elif _cvc.match(w):
                    w += "e"

    # ---- step 1c: y -> i
    m = _step1c.match(w)
    if m and _s_v.match(m.group(1)):
        w = m.group(1) + "i"

    # ---- step 2
    m = _step2.match(w)
    if m and _mgr0.match(m.group(1)):
        w = m.group(1) + _STEP2[m.group(2)]

    # ---- step 3
    m = _step3.match(w)
    if m and _mgr0.match(m.group(1)):
        w = m.group(1) + _STEP3[m.group(2)]

    # ---- step 4
    m = _step4_1.match(w)
    if m:
        if _mgr1.match(m.group(1)):
            w = m.group(1)
    else:
        m = _step4_2.match(w)
        if m:
            s = m.group(1) + m.group(2)
            if _mgr1.match(s):
                w = s

    # ---- step 5a: trailing e
    m = _step5.match(w)
    if m:
        s = m.group(1)
        if _mgr1.match(s) or (_meq1.match(s) and not _cvc.match(s)):
            w = s

    # ---- step 5b: -ll
    if _step5_ll.search(w) and _mgr1.match(w):
        w = w[:-1]

    if first_y:
        w = "y" + w[1:]
    return w

"""Rule-based English lemmatizer — deterministic stand-in for WordNet.

The reference lemmatizes TF-IDF features with NLTK's WordNetLemmatizer
(reference: src/models/train_tfidf.py:24-34); NLTK corpora can't be
downloaded in this sandbox, so this implements the well-known
noun-lemmatization core as pure suffix rules: the WordNet *morphy*
detachment rules for nouns (published in the WordNet 3.0 docs) plus a
small irregular map.  It is a documented approximation — verbs/adjectives
are left to the -ing/-ed detachments and no dictionary check is possible —
adequate for its only use: ML-sidecar feature preprocessing (the index
path never lemmatizes; it uses the Porter chain like the reference's BM25
path).  Swap in the real WordNetLemmatizer via the ``lemmatizer_factory``
seam in operators/ml.py when NLTK data is available.
"""

from __future__ import annotations

_IRREGULAR = {
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "people": "person",
    "leaves": "leaf", "lives": "life", "knives": "knife", "wives": "wife",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "data": "datum", "criteria": "criterion", "was": "be", "is": "be",
    "are": "be", "been": "be", "has": "have", "had": "have", "does": "do",
    "did": "do", "went": "go", "made": "make", "said": "say", "ran": "run",
}

# WordNet morphy noun detachment rules (suffix -> replacement), in order.
# Morphy proper checks each candidate stem against the WordNet dictionary;
# with no dictionary available, the ("ses", "s") rule is gated on a
# consonant before the suffix ('senses' -> 'sens') so vowel-stem nouns
# fall through to the plain ("s", "") rule ('houses' -> 'house',
# 'causes' -> 'cause') instead of being clipped to 'hous'/'caus'.
_NOUN_RULES = [
    ("ches", "ch"), ("shes", "sh"), ("xes", "x"), ("zes", "z"),
    ("sses", "ss"), ("ses", "s"), ("ies", "y"), ("s", ""),
]

# Common nouns whose singular ends in vowel+'s' (bus, gas, virus...):
# the vowel gate on the ('ses','s') rule would otherwise send their
# plurals through the plain ('s','') rule ('buses' -> 'buse').  A real
# morphy resolves this with its dictionary lookup; dictionary-free, a
# small closed list is the honest tradeoff — unlisted vowel+s nouns
# ('crocuses') still clip to '-use' while the far more frequent '-se'
# nouns ('houses' -> 'house', 'causes' -> 'cause') stay correct.
_S_NOUN_STEMS = {
    "bus", "gas", "virus", "census", "bonus", "campus", "status", "corpus",
    "radius", "alias", "atlas", "bias", "canvas", "lens", "plus", "surplus",
    "genus", "minus", "iris", "consensus", "apparatus", "syllabus",
}

_VOWELS = set("aeiou")


def _undouble(stem: str) -> str:
    """stopp -> stop, runn -> run (keep -ll/-ss: fall, pass)."""
    if (
        len(stem) >= 3
        and stem[-1] == stem[-2]
        and stem[-1] not in _VOWELS
        and stem[-1] not in ("l", "s")
    ):
        return stem[:-1]
    return stem


def lemmatize(word: str) -> str:
    """Lowercased word -> lemma (irregulars, then noun detachments, then
    -ing/-ed verb detachments with degemination).  Dictionary-free, so a
    consistent approximation rather than WordNet-exact — see module doc."""
    w = word.lower()
    irr = _IRREGULAR.get(w)
    if irr is not None:
        return irr  # before the length guard: 'is' -> 'be'
    if len(w) <= 2:
        return w
    if w.endswith("s") and not w.endswith("ss"):
        if w.endswith("es") and w[:-2] in _S_NOUN_STEMS:
            return w[:-2]  # buses -> bus, lenses -> lens
        for suf, rep in _NOUN_RULES:
            if not w.endswith(suf):
                continue
            if suf == "ses" and (len(w) < 4 or w[-4] in _VOWELS):
                continue  # vowel+ses: defer to the plain 's' rule
            stem = w[: -len(suf)] + rep
            if len(stem) >= 2:
                return stem
        return w
    for suf in ("ing", "ed"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if len(stem) >= 2 and any(c in _VOWELS for c in stem):
                return _undouble(stem)
            return w
    return w


def lemmatize_tokens(tokens: list[str]) -> list[str]:
    return [lemmatize(t) for t in tokens]

"""Pure-Python BM25F oracle (SURVEY.md §5.2.2).

Textbook loops implementing exactly the Whoosh BM25F semantics the
reference relies on (src/search/search_bm25.py:30-36): same analyzer chain
(imported from the engine — shared semantics by construction), idf =
ln(N/(df+1))+1 with field-local df, K1=1.2, B=0.75, field boosts, AND/OR
query modes, tiebreak (score desc, doc_id asc).  Whoosh itself cannot be
installed in this sandbox, so this golden-locked oracle *is* the
rank-identity reference.
"""

from __future__ import annotations

import math

from beetle_search_engine_spark.functions.analyzer import analyze_query, analyze_tf


def bm25_oracle(
    docs: list[dict],
    query: str,
    fields: dict[str, str],
    k1: float = 1.2,
    b: float = 0.75,
    boosts: dict | None = None,
    top_k: int = 10,
    mode: str = "and",
    fielded: dict | None = None,
    excluded: list | None = None,
    terms: list | None = None,
) -> list[tuple[str, float]]:
    """docs: list of dicts with 'doc_id' plus the source columns named in
    ``fields`` (index-field -> column).  Returns [(doc_id, score)] top-k.

    ``fielded``: term -> field restriction (``field:term`` queries — the
    term only matches/scores in that field).  ``excluded``: NOT terms —
    docs containing any of them in any field are dropped."""
    boosts = boosts or {"title": 2.0, "body": 1.0}
    n = len(docs)
    tfs: dict[str, list] = {f: [] for f in fields}
    dls: dict[str, list] = {f: [] for f in fields}
    for d in docs:
        for fname, col in fields.items():
            tf = analyze_tf(d.get(col) or "")
            tfs[fname].append(tf)
            dls[fname].append(sum(tf.values()))
    avgdl = {f: (sum(dls[f]) / n if n else 1.0) for f in fields}
    df: dict[tuple[str, str], int] = {}
    for fname in fields:
        for tf in tfs[fname]:
            for t in tf:
                df[(fname, t)] = df.get((fname, t), 0) + 1

    if terms is None:
        terms = analyze_query(query)  # else: pre-analyzed (parser output)
    if not terms:
        return []
    fielded = fielded or {}
    excluded = excluded or []
    scored = []
    for i, d in enumerate(docs):
        if any(tfs[fname][i].get(t, 0) for t in excluded for fname in fields):
            continue  # NOT: doc contains an excluded term somewhere
        matched_terms = 0
        score = 0.0
        for t in terms:
            hit = False
            for fname in fields:
                if t in fielded and fielded[t] != fname:
                    continue  # field:term — only that field matches
                tf = tfs[fname][i].get(t, 0)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(n / (df[(fname, t)] + 1.0)) + 1.0
                w = tf * boosts.get(fname, 1.0)
                dl = dls[fname][i]
                score += idf * (w * (k1 + 1.0)) / (w + k1 * (1.0 - b + b * dl / avgdl[fname]))
            if hit:
                matched_terms += 1
        if mode == "and" and matched_terms < len(terms):
            continue
        if matched_terms == 0:
            continue
        scored.append((d["doc_id"], score))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:top_k]


def assert_rank_identical(engine: list[tuple[str, float]], oracle: list[tuple[str, float]], rel_tol=1e-9):
    """Rank-identity allowing reordering only among float-level ties."""
    assert len(engine) == len(oracle), f"result sizes differ: {len(engine)} vs {len(oracle)}"
    for i, ((eid, es), (oid, os_)) in enumerate(zip(engine, oracle)):
        close = abs(es - os_) <= rel_tol * max(1.0, abs(os_))
        assert close, f"rank {i}: score {es} vs oracle {os_} ({eid}/{oid})"
        if eid != oid:
            # permitted only if this is a tie neighborhood: same score set
            e_near = {d for d, s in engine if abs(s - es) <= rel_tol * max(1.0, abs(es))}
            o_near = {d for d, s in oracle if abs(s - os_) <= rel_tol * max(1.0, abs(os_))}
            assert eid in o_near and oid in e_near, (
                f"rank {i}: doc {eid} vs oracle {oid} not a tie-swap"
            )

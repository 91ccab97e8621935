"""Reciprocal-rank fusion (SURVEY J5/A6; reference:
src/search/hybrid_search.py:22-30,60-63).

RRF(doc) = sum over systems of 1 / (k + rank) with 1-based ranks —
identical to the reference's 1/(k + rank + 1) over 0-based enumerate.
Implemented as unionByName of tagged ranked lists + one hash aggregation
(equivalent to a full outer join for two systems, but shuffle-lighter and
n-ary for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_rank(df: DataFrame, score_col: str, id_col: str, ascending: bool = False) -> DataFrame:
    """Attach a deterministic 1-based rank: (score, id asc) tiebreak.

    SCOPE: for the small already-top-k'd frames RRF fuses (<= a few
    hundred rows) — the global, partition-less window is a deliberate
    single-task sort of k rows.  Do NOT apply to large frames; rank a big
    frame per-partition-key instead (e.g. textops.top_per_group)."""
    order = [F.asc(score_col) if ascending else F.desc(score_col), F.asc(id_col)]
    return df.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """ranked: system name -> DataFrame[id_col, rank].  Returns
    (doc_id, rrf_score, n_systems) top-k."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked system")
    tagged = None
    for name, df in ranked.items():
        t = df.select(F.col(id_col), F.col("rank")).withColumn("system", F.lit(name))
        tagged = t if tagged is None else tagged.unionByName(t)
    return (
        tagged.groupBy(id_col)
        .agg(
            F.round(F.sum(1.0 / (F.lit(k) + F.col("rank"))), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_systems"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(top_k)
    )

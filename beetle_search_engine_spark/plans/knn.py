"""Vector similarity search (SURVEY J6/F17, reference FAISS path:
src/index/build_faiss.py:30-43 IndexFlatL2; src/search/search_faiss.py:48).

Brute-force exact top-k is the baseline: distance as a pure column
expression (zip_with + aggregate, JVM-side) over the embeddings table, then
TakeOrderedAndProject — at scale a single narrow scan + a k-row merge, no
shuffle of the vectors.  FAISS returns *squared* L2; we keep that.

The scale path is sign-LSH (random-hyperplane) bucketing: a deterministic
hash projection assigns each vector a bucket key; queries probe only their
own bucket (equi-join partition pruning instead of a full scan).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _query_vec(emb: DataFrame, query_id: int, id_col: str, vec_col: str) -> DataFrame:
    return emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qvec"))


def _dot(a, b) -> F.Column:
    """JVM-side dot product via HOF lambdas.  These evaluate INTERPRETED
    (not codegen), so this was A/B'd against an Arrow pandas-UDF numpy
    matmul on the exact-verify shape (cosine top-k, dim 64, 3
    interleaved runs each, local[8]): 200k rows 0.73 s vs 0.42 s, 500k
    rows 0.91 s vs 0.55-0.70 s — the UDF wins ~1.7x, below the 2x bar
    that would justify adding a Python-worker + Arrow-pipe dependency to
    every distance consumer.  Kept JVM-side; revisit only if a verify
    stage becomes dominated by exact distances at >2x."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_l2(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b) -> F.Column:
    """The one cosine-similarity expression every exact-verify path
    shares (knn_cosine, near-dup verify, LSH/IVF/PQ refine stages).  The
    norms are deliberately evaluated in-expression, NOT precomputed
    driver-side: the DuckDB oracles restate sqrt(sum(x*x)) per row, and
    a reordered float product could flip a round(,4) boundary."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def knn_l2(emb: DataFrame, query_id: int, top_k: int = 10, id_col="vec_id", vec_col="embedding") -> DataFrame:
    """Exact KNN by squared L2, ascending (FAISS IndexFlatL2 semantics),
    query vector taken from the table itself (self excluded)."""
    q = F.broadcast(_query_vec(emb, query_id, id_col, vec_col))
    return (
        emb.crossJoin(q)
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(_sq_l2(F.col(vec_col), F.col("qvec")), 4).alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(top_k)
    )


def knn_dot(emb: DataFrame, query_id: int, top_k: int = 10, id_col="vec_id", vec_col="embedding") -> DataFrame:
    q = F.broadcast(_query_vec(emb, query_id, id_col, vec_col))
    return (
        emb.crossJoin(q)
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(_dot(F.col(vec_col), F.col("qvec")), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def knn_cosine(emb: DataFrame, query_id: int, top_k: int = 10, id_col="vec_id", vec_col="embedding") -> DataFrame:
    q = F.broadcast(_query_vec(emb, query_id, id_col, vec_col))
    return (
        emb.crossJoin(q)
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), F.col("qvec")), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# scale path: sign-LSH bucketing


def plane_component(j: int, i: int, seed: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1],
    derived from md5(j:i:seed) — reproducible on any cluster with no
    stored model, and bit-identical in any engine with md5 (the DuckDB
    oracle inlines the same constants)."""
    h = int(hashlib.md5(f"{j}:{i}:{seed}".encode()).hexdigest()[:8], 16)
    return ((h % 2001) - 1000) / 1000.0


def plane_matrix(dim: int, planes: int, seed: int) -> list[list[float]]:
    return [[plane_component(j, i, seed) for i in range(dim)] for j in range(planes)]


def _sign_bits(vec_col, dim: int, planes: int, seed: int) -> F.Column:
    """LSH bucket key: sign bits of dot products against the deterministic
    hyperplanes.  Plane components are driver-computed constants folded
    into the plan as literal arrays — the executors only do multiply-adds
    (no per-row hashing)."""
    if planes > 30:
        # the bucket key packs one bit per plane into a 32-bit int: more
        # planes would overflow the cast and silently merge distinct
        # sign patterns into one bucket (use multiple tables, not more
        # planes — recall drops exponentially with planes anyway)
        raise ValueError(f"planes={planes} exceeds the 30-bit bucket key")
    mat = plane_matrix(dim, planes, seed)
    bits = []
    for j in range(planes):
        d = F.aggregate(
            F.zip_with(
                vec_col,
                F.array([F.lit(x) for x in mat[j]]),
                lambda x, p: (x * p).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_index(emb: DataFrame, dim: int, planes: int = 6, seed: int = 42, vec_col="embedding") -> DataFrame:
    return emb.withColumn("lsh_bucket", _sign_bits(F.col(vec_col), dim, planes, seed))


def cosine_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    min_cosine: float = 0.9,
    planes: int = 6,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
    max_bucket: int = 2000,
    n_tables: int = 4,
) -> DataFrame:
    """(id_a, id_b, cosine): embedding near-duplicate pairs via sign-LSH
    bucketing with OR-amplification — candidates are pairs sharing a
    bucket in ANY of ``n_tables`` independent hash tables (per-table
    same-key equi-join, never all-pairs), then verified with the exact
    cosine so precision is always exact.

    Recall math (why one table is NOT enough): two vectors at cosine c
    agree on one hyperplane sign with p = 1 - arccos(c)/pi, so one
    6-plane table recovers p^6 of qualifying pairs — only ~39% at
    c = 0.9.  T independent tables recover 1 - (1 - p^planes)^T: the
    default 4 tables give ~86% at 0.9 and ~95% at 0.95.  More planes
    per table SHARPEN buckets (fewer false candidates) but recall decays
    exponentially — add tables, not planes, to raise recall.

    ``max_bucket`` drops degenerate buckets before each quadratic
    self-join (same skew guard as MinHash-LSH banding); candidate pairs
    are deduped across tables before the one exact-verify pass."""
    base = emb.select(id_col, vec_col)
    cand = None
    for t in range(n_tables):
        idx = lsh_index(base, dim, planes, seed + t, vec_col).select(id_col, "lsh_bucket")
        sizes = idx.groupBy("lsh_bucket").agg(F.count(F.lit(1)).alias("_bsz"))
        kept = idx.join(
            sizes.filter((F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket)),
            "lsh_bucket",
        ).drop("_bsz")
        a = kept.alias("a")
        b = kept.alias("b")
        p = a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", F.round(cosine_col(F.col("_va"), F.col("_vb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


def ann_lsh_cosine(
    emb: DataFrame,
    query_id: int,
    dim: int,
    top_k: int = 10,
    planes: int = 6,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
    hamming_radius: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via multi-probe sign-LSH: probe every
    bucket within ``hamming_radius`` sign-bit flips of the query's bucket
    (standard multi-probe LSH — a near neighbor differs from the query on
    at most a few hyperplane signs, so probing the Hamming ball recovers
    most of the recall single-bucket probing loses; radius 0 = classic
    single-bucket).  At scale the ball is a small explicit bucket list
    (planes+1 buckets at radius 1) over bucket-partitioned storage ->
    partition-pruned scan; here the 1-row query bucket is broadcast and
    the ball test is a bit_count on the JVM side."""
    idx = lsh_index(emb, dim, planes, seed, vec_col)
    qrow = F.broadcast(
        idx.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("qvec"), F.col("lsh_bucket").alias("qbucket")
        )
    )
    cos = cosine_col(F.col(vec_col), F.col("qvec"))
    ball = F.bit_count(idx.lsh_bucket.bitwiseXOR(F.col("qbucket"))) <= hamming_radius
    return (
        idx.join(qrow, ball)
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(cos, 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )

"""Deduplication operators for large-scale corpus pipelines.

Not present in the reference (its only dedup is the crawler's visited-set,
src/ETL/website_crawler.py:22,31-33 — SURVEY U1); these are the standard
web-scale family, built Spark-first:

  exact        — content-hash groupBy (one shuffle, map-side combined)
  minhash      — k independent permutations approximated by seeded md5;
                 signatures via groupBy(min), LSH banding via band-key
                 equi-join (bucket join replaces the O(n^2) pair scan)
  simhash      — bitwise majority vote over hashed terms, one groupBy
  ngram jaccard— exact token/shingle Jaccard for candidate pairs only

Hash function is md5-hex-prefix -> int64, chosen because Spark and DuckDB
produce identical md5 hex, making every operator oracle-checkable in SQL.
At 100 TB each of these is shuffle-bound on (term|band|hash) keys — all
Catalyst hash aggregations/joins that AQE can re-plan for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import sql_tokens, sql_tokens_pos


def _h64(col: F.Column, seed) -> F.Column:
    """Deterministic 32-bit-range hash shared bit-for-bit with DuckDB:
    first 8 hex chars of md5(value || '#' || seed) as a bigint."""
    s = F.concat(col, F.lit("#"), F.lit(str(seed)) if not isinstance(seed, F.Column) else seed.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """(content_hash, n_dups, keep_id): exact duplicate groups; keep_id is
    the smallest id (the canonical survivor)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def shingles(df: DataFrame, n: int = 3, text_col="text", id_col="doc_id") -> DataFrame:
    """(id, shingle): distinct n-gram word shingles via window lead —
    expressible identically in ANSI SQL."""
    t = sql_tokens_pos(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("ord")
    cols = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, n)]
    return (
        t.select(F.col(id_col), F.concat_ws(" ", *cols).alias("shingle"), *[c.alias(f"_l{i}") for i, c in enumerate(cols[1:])])
        .filter(F.col(f"_l{n-2}").isNotNull() if n > 1 else F.lit(True))
        .select(id_col, "shingle")
        .distinct()
    )


def minhash_signatures(
    df: DataFrame, num_perm: int = 8, shingle_n: int = 3, text_col="text", id_col="doc_id"
) -> DataFrame:
    """(id, seed, minhash): num_perm seeded min-hashes over n-gram shingles."""
    sh = shingles(df, shingle_n, text_col, id_col)
    seeds = df.sparkSession.range(num_perm).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(F.col(id_col), "seed", _h64(F.col("shingle"), F.col("seed")).alias("h"))
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    num_perm: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    text_col="text",
    id_col="doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b): pairs sharing at least one LSH band (band key =
    md5 of the band's concatenated minhashes); the band equi-join is the
    scale path — no all-pairs comparison ever happens.

    ``max_bucket`` is the skew guard: the self-join is quadratic PER band
    key, so one degenerate bucket (empty docs, license boilerplate)
    would stall the stage at scale.  Bucket sizes are counted first (one
    map-side-combined aggregation) and buckets above the cap are dropped
    before the join — standard web-scale MinHash-dedup practice; members
    of a mega-bucket are near-dups of boilerplate, not of each other's
    payload, and exact/fingerprint dedup catches the true-identical ones.
    """
    sig = minhash_signatures(df, num_perm, shingle_n, text_col, id_col)
    bands = (
        sig.withColumn("band", F.floor(F.col("seed") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(F.col("minhash").cast("string"))))).alias("band_key"))
    )
    sizes = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("_bsz"))
    bands = (
        bands.join(
            sizes.filter((F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket)),
            ["band", "band_key"],
        )
        .drop("_bsz")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_key") == F.col("b.band_key")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    min_jaccard: float = 0.0,
    text_col="text",
    id_col="doc_id",
) -> DataFrame:
    """(id_a, id_b, jaccard): exact distinct-token Jaccard for candidate
    pairs (from LSH, or any (id_a, id_b) frame)."""
    toks = sql_tokens(df, text_col, id_col).distinct()
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is None:
        candidates = lsh_candidate_pairs(df, text_col=text_col, id_col=id_col)
    ta = toks.select(F.col(id_col).alias("id_a"), "term")
    tb = toks.select(F.col(id_col).alias("_idb"), F.col("term").alias("term_b"))
    inter = (
        candidates.join(ta, "id_a")
        .join(tb, (F.col("id_b") == F.col("_idb")) & (F.col("term") == F.col("term_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def simhash(df: DataFrame, bits: int = 16, text_col="text", id_col="doc_id") -> DataFrame:
    """(id, simhash): bitwise majority over distinct-term hashes.

    One hash aggregation with ``bits`` conditional-sum columns — no row
    inflation (the naive explode-per-bit shape multiplies the token
    stream x64 at production simhash widths), fully codegen'd, one
    shuffle, map-side combined.  Each 32-bit word of the fingerprint
    draws from an independently-seeded term hash, so widths up to 64 get
    real entropy.  Bit 63's weight wraps to int64 min in both Spark and
    DuckDB, so the packed value is the signed reinterpretation of the
    bit pattern — consistent across engines."""
    toks = sql_tokens(df, text_col, id_col).distinct()
    n_words = (bits + 31) // 32
    h = toks.select(
        F.col(id_col), *[_h64(F.col("term"), w).alias(f"h{w}") for w in range(n_words)]
    )
    votes = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.expr(f"shiftright(h{b // 32}, {b % 32})").bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    weight = lambda b: (1 << b) if b < 63 else -(1 << 63)  # noqa: E731
    packed = sum(
        (
            F.when(F.col(f"s{b}") > 0, F.lit(weight(b)).cast("long")).otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ),
        start=F.lit(0).cast("long"),
    )
    return votes.select(F.col(id_col), packed.alias("simhash"))

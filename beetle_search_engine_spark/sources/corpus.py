"""Corpus sources.

Two roles (SURVEY.md §7 step 1):

1. :func:`generate_corpus` — a deterministic, fully-distributed generator
   for the Iceberg-shaped source-code table
   ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).
   Everything is built from ``spark.range`` + hash expressions, i.e. pure
   JVM/codegen — no driver-side data, no Python row loops — so the same
   code synthesizes 10^3 docs for tests or 10^9 on a cluster.  Token
   frequencies follow a Zipf-ish head (multiplicity-weighted vocabulary)
   plus a long identifier tail, reproducing the hot-term skew the salted
   build path exists for.  Iceberg jars aren't in the sandbox, so tables
   are written/read as parquet behind ``EngineConfig.source_format``; on a
   real cluster set it to "iceberg" and nothing else changes.

2. Loaders for the driver-provided testdata tables
   (``documents.parquet`` == the reference's clean corpus role,
   reference: src/ETL/filter_blogs.py:31-36 -> data/clean/blogs.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# vocabulary with Zipf-ish multiplicities (common code/query words up front)

_COMMON = (
    "def class return import self value result data table query index key "
    "row column scan filter join group sort merge hash range list dict set "
    "str int float bool none true false while for else elif try except "
    "raise with open read write close file path name type args kwargs "
    "test assert mock patch config param option flag debug info warn error "
    "log print format parse build make init new delete update insert select "
    "count sum avg min max len size shape batch stream buffer cache pool "
    "thread lock async await yield lambda map reduce apply call run exec "
    "start stop main entry node edge graph tree heap stack queue array "
    "vector matrix tensor model train eval predict score loss grad optim "
    "layer input output hidden state token term doc corpus search rank "
    "transformer models embedding attention encoder decoder pipeline spark "
    "partition shuffle broadcast executor driver task stage job plan"
).split()


def _weighted_vocab(cap_mult: int = 64) -> list[str]:
    """Expand _COMMON into a multiplicity-weighted slot array: token at
    rank r gets ~cap_mult/r slots (Zipf), min 1."""
    slots: list[str] = []
    for r, w in enumerate(_COMMON, start=1):
        slots.extend([w] * max(1, cap_mult // r))
    return slots


_LANGS = ["py", "js", "java", "go", "rs", "cpp"]
_EXT = {"py": "py", "js": "js", "java": "java", "go": "go", "rs": "rs", "cpp": "cc"}


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_repos: int | None = None,
    avg_tokens: int = 120,
) -> DataFrame:
    """Deterministic Iceberg-shaped corpus (repo, path, commit, lang,
    content, doc_id, content_sha).  Same (n_docs, seed) -> same bytes."""
    if n_repos is None:
        n_repos = max(4, n_docs // 500)
    slots = _weighted_vocab()
    vocab = F.lit(slots)
    v_n = len(slots)

    df = spark.range(n_docs).withColumn("_s", F.lit(seed))
    h = lambda *cols: F.xxhash64(*cols, F.col("_s"))  # noqa: E731

    lang = F.element_at(F.lit(_LANGS), (F.pmod(h(F.col("id"), F.lit(1)), F.lit(len(_LANGS))) + 1).cast("int"))
    ext = F.element_at(F.lit([_EXT[l] for l in _LANGS]), (F.pmod(h(F.col("id"), F.lit(1)), F.lit(len(_LANGS))) + 1).cast("int"))
    repo = F.concat(F.lit("org/repo-"), F.pmod(h(F.col("id"), F.lit(2)), F.lit(n_repos)).cast("string"))
    path = F.concat(
        F.lit("src/module_"),
        F.pmod(h(F.col("id"), F.lit(3)), F.lit(50)).cast("string"),
        F.lit("/file_"),
        F.col("id").cast("string"),
        F.lit("."),
        ext,
    )
    commit = F.substring(F.sha2(F.concat(F.lit("c"), F.col("id").cast("string"), F.lit(str(seed))), 256), 1, 40)

    # content: variable-length Zipf-weighted common words + a rare
    # identifier tail (unique-ish tokens -> realistic vocabulary size)
    # greatest(…, 0): at avg_tokens <= 90 the raw expression can go
    # non-positive, and F.sequence(0, n_tok - 1) would then count DOWN
    # ([0, -1, ...]) instead of yielding an empty token list — garbage
    # content with negative hash indices, silently.  Unchanged for the
    # default avg_tokens (the determinism contract holds bit-for-bit).
    n_tok = F.greatest(
        (F.lit(avg_tokens - 90) + F.pmod(h(F.col("id"), F.lit(7)), F.lit(180))).cast("int"),
        F.lit(0),
    )
    common_part = F.array_join(
        F.transform(
            F.when(n_tok > 0, F.sequence(F.lit(0), n_tok - 1)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(F.col("id"), i, F.col("_s")), F.lit(v_n)) + 1).cast("int")),
        ),
        " ",
    )
    rare_part = F.concat_ws(
        " ",
        F.concat(F.lit("fn_"), F.pmod(h(F.col("id"), F.lit(11)), F.lit(max(1000, n_docs))).cast("string")),
        F.concat(F.lit("var_"), F.pmod(h(F.col("id"), F.lit(13)), F.lit(max(2000, n_docs * 2))).cast("string")),
        F.concat(F.lit("cls_"), F.pmod(h(F.col("id"), F.lit(17)), F.lit(max(500, n_docs // 2))).cast("string")),
    )
    content = F.concat_ws(" ", common_part, rare_part)

    out = (
        df.select(
            repo.alias("repo"),
            path.alias("path"),
            commit.alias("commit"),
            lang.alias("lang"),
            content.alias("content"),
        )
        # identity & per-row invariant columns (SURVEY.md §1.4;
        # reference computes sha256(url) at src/ETL/parse.py:21-23)
        .withColumn("doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256))
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
    )
    return out


def verify_content_sha(corpus: DataFrame) -> int:
    """Per-row invariant (BASELINE.json input_hint): recompute
    sha2(content,256) as a vectorized column and count mismatches vs the
    stored digest.  Returns the mismatch count (0 == pass)."""
    return corpus.filter(F.sha2(F.col("content"), 256) != F.col("content_sha")).count()


# ---------------------------------------------------------------------------
# driver testdata loaders


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the testdata documents table to the corpus shape: the text
    column plays the reference's body_text (filter_blogs.py:31-36)."""
    d = load_documents(spark, sf_dir)
    return d.select(
        d.source.alias("repo"),
        F.concat(F.lit("doc/"), d.doc_id.cast("string")).alias("path"),
        F.sha2(d.doc_id.cast("string"), 256).substr(1, 40).alias("commit"),
        d.lang,
        d.text.alias("content"),
        d.doc_id.cast("string").alias("doc_id"),
        F.sha2(d.text, 256).alias("content_sha"),
    )

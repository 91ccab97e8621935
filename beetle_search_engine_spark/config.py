"""Engine configuration.

Replaces the reference's params.yaml (reference: params.yaml:1-24) with an
explicit dataclass. BM25 constants mirror the reference's Whoosh defaults
(reference: src/index/build_bm25.py:7-13 — nothing overridden, so Whoosh
scoring.BM25F defaults K1=1.2, B=0.75; title field_boost=2.0 at :11).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75
    # field -> boost; reference boosts title 2.0 (build_bm25.py:11)
    field_boosts: dict = field(default_factory=lambda: {"title": 2.0, "body": 1.0})


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout of the posting-list index.

    The index is parquet, hive-partitioned by ``bucket`` =
    pmod(xxhash64(term), n_buckets) so a query's scan prunes to the
    buckets of its terms.  Rows are *block groups*: up to
    ``blocks_per_row`` blocks of ``block_size`` postings each, never
    straddling a ``chunk_docs``-aligned docnum boundary, so the query
    side can shuffle rows by chunk and score chunks independently.
    """

    n_buckets: int = 64            # parquet partition dirs (scale: 1024+)
    block_size: int = 128          # postings granule
    blocks_per_row: int = 8        # <=1024 postings per parquet row; the
    # row is the block-max skip unit — smaller rows = finer WAND pruning,
    # more row metadata
    chunk_docs: int = 1 << 16      # docnum range scored per WAND task
    # terms with df above this are salted across `hot_salts` encode
    # partitions (Zipf head defusal); None -> max(5000, N // 50)
    hot_df_threshold: int | None = None
    hot_salts: int = 16
    encode_partitions: int | None = None  # None -> spark default parallelism
    bucket_groups: int = 8         # resume granularity (manifest per group)


@dataclass(frozen=True)
class EngineConfig:
    bm25: BM25Params = field(default_factory=BM25Params)
    index: IndexConfig = field(default_factory=IndexConfig)
    # "python" (default): full analyzer chain per doc in one Arrow
    # mapInPandas — zero shuffles, fastest measured at sandbox scales.
    # "jvm": T1-T3 as Catalyst expressions + distinct-token Porter via a
    # broadcast dimension — parity-tested alternative; pays one extra
    # pipeline evaluation + the stem broadcast, wins only when Python
    # worker CPU (not memory bandwidth) is the binding constraint.
    tokenizer: str = "python"
    source_format: str = "parquet"  # Iceberg jars unavailable in sandbox;
    # at deploy time set "iceberg" and the readers pick it up unchanged.

    # default retrieval depths (reference: params.yaml:20-24)
    top_k: int = 10
    rerank_k: int = 10
    rrf_k: int = 60                 # reference: src/search/hybrid_search.py:22


DEFAULT = EngineConfig()

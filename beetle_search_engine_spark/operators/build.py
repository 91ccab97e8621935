"""Inverted-index build (SURVEY.md §7 steps 3-4, §4.2.1-2).

Pipeline (all DataFrame, one Python kernel):

  corpus ── assign_docnums ──> dim (docnum, doc_id, meta)
  dim ── tokenize (Arrow UDF) ──> tokens (docnum, field, term, tf, dl)   [persist]
  tokens ── groupBy(field).sum(tf) ──────> avgdl per field      (map-side combine)
  tokens ── groupBy(field,term).count ──> df; df>threshold ──> hot set (broadcast)
  tokens ── +bucket +salt, repartition(xxhash64(term,salt))
         ── sortWithinPartitions(field,term,docnum)
         ── mapInPandas(encode) ──> posting rows ──> parquet partitionBy(bucket)

Physical layout: rows are *block groups* — up to blocks_per_row blocks of
block_size postings, chunk-aligned (a row never spans a chunk_docs docnum
boundary), binary columns gap+varint encoded, float32 per-block max BM25F
score bounds (rounded up) for block-max WAND.  Doc lengths are embedded
per posting, so querying never touches a doclen table (no per-query
doclen shuffle at any scale).

Skew: Zipf-head terms (df > hot threshold) are salted across
``hot_salts`` encode partitions keyed by chunk id, so no reducer ever
owns a whole hot posting list; salted runs stay chunk-aligned and
merge by concatenation at query time.  Their exact df is injected from a
small broadcast map (collected from the df aggregation).

Resume: the bucket space is split into ``bucket_groups`` groups; each
group is one write + one manifest JSON (input fingerprint, counts,
timings, skew ratio).  A rerun with the same corpus fingerprint skips
completed groups (reference analog: skip-if-exists at
src/index/build_splade.py:35-37 and DVC dep hashing in dvc.yaml).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .codecs import encode_docgaps, varint_encode
from .docnums import assign_docnums, write_docids
from .scoring import term_scores
from .tokenize import tokenize

POSTINGS_SCHEMA = (
    "bucket int, field string, term string, df long, chunk long, "
    "doc_lo long, doc_hi long, n int, max_score float, "
    "block_n array<int>, block_max array<float>, "
    "docs binary, tfs binary, dls binary"
)


def _fingerprint(dim: DataFrame) -> dict:
    row = dim.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(doc_id))").alias("h"),
    ).collect()[0]
    return {"n_docs": int(row["n"]), "id_hash_xor": int(row["h"] or 0)}


def _make_encode_kernel(cfg: EngineConfig, stats: dict, hot_df: dict):
    """Streaming per-partition encoder.  Input is sorted by
    (field, term, docnum); buffers one (field, term) run at a time
    (bounded: non-hot runs <= hot threshold, hot runs <= df/hot_salts),
    then flushes chunk-aligned block-group rows."""
    block = cfg.index.block_size
    row_cap = block * cfg.index.blocks_per_row
    chunk_docs = cfg.index.chunk_docs
    k1, b = cfg.bm25.k1, cfg.bm25.b
    boosts = dict(cfg.bm25.field_boosts)
    n_docs = stats["n_docs"]
    avgdl = stats["avgdl"]

    def flush(field, term, bucket, docs, tfs, dls, out):
        docs = np.concatenate(docs)
        tfs = np.concatenate(tfs).astype(np.float64)
        dls = np.concatenate(dls).astype(np.float64)
        df = hot_df.get((field, term), docs.size)
        boost = boosts.get(field, 1.0)
        scores = term_scores(tfs, dls, df, boost, k1, b, n_docs, avgdl[field])
        chunks = docs // chunk_docs
        # row boundaries: at every chunk change, and every row_cap postings
        change = np.flatnonzero(chunks[1:] != chunks[:-1]) + 1
        spans = np.concatenate(([0], change, [docs.size]))
        starts: list[int] = []
        for s, e in zip(spans[:-1], spans[1:]):
            starts.extend(range(int(s), int(e), row_cap))
        bounds = starts + [docs.size]
        for s, e in zip(bounds[:-1], bounds[1:]):
            d, t, l, sc = docs[s:e], tfs[s:e], dls[s:e], scores[s:e]
            bstarts = np.arange(0, d.size, block)
            bmax = np.maximum.reduceat(sc, bstarts)
            bmax32 = np.nextafter(bmax.astype(np.float32), np.float32(np.inf))
            bn = np.diff(np.append(bstarts, d.size)).astype(np.int32)
            out.append(
                {
                    "bucket": bucket,
                    "field": field,
                    "term": term,
                    "df": int(df),
                    "chunk": int(d[0] // chunk_docs),
                    "doc_lo": int(d[0]),
                    "doc_hi": int(d[-1]),
                    "n": int(d.size),
                    "max_score": float(bmax32.max()),
                    "block_n": bn.tolist(),
                    "block_max": bmax32.tolist(),
                    "docs": encode_docgaps(d),
                    "tfs": varint_encode(t.astype(np.uint64)),
                    "dls": varint_encode(l.astype(np.uint64)),
                }
            )

    def kernel(batches):
        cur = None  # (field, term, bucket)
        bufs = ([], [], [])  # docs, tfs, dls
        out: list[dict] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fields = pdf["field"].to_numpy()
            terms = pdf["term"].to_numpy()
            docs = pdf["docnum"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["dl"].to_numpy()
            buckets = pdf["bucket"].to_numpy()
            # span boundaries where (field, term) changes
            change = np.flatnonzero((fields[1:] != fields[:-1]) | (terms[1:] != terms[:-1])) + 1
            bounds = np.concatenate(([0], change, [len(pdf)]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                key = (fields[s], terms[s], int(buckets[s]))
                if cur is not None and key != cur:
                    flush(cur[0], cur[1], cur[2], *bufs, out)
                    bufs = ([], [], [])
                cur = key
                bufs[0].append(docs[s:e])
                bufs[1].append(tfs[s:e])
                bufs[2].append(dls[s:e])
            if len(out) >= 256:
                yield pd.DataFrame(out)
                out = []
        if cur is not None:
            flush(cur[0], cur[1], cur[2], *bufs, out)
        if out:
            yield pd.DataFrame(out)

    return kernel


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    fields: dict[str, str] | None = None,
    cfg: EngineConfig = DEFAULT,
    meta_cols: tuple[str, ...] = (),
    resume: bool = True,
) -> dict:
    """Build (or resume) the index at ``index_dir``.  Returns build metrics."""
    fields = fields or {"body": "content"}
    os.makedirs(f"{index_dir}/_manifest", exist_ok=True)
    t0 = time.time()

    dim = assign_docnums(corpus)
    fp = _fingerprint(dim)
    n_docs = fp["n_docs"]

    stats_path = f"{index_dir}/stats.json"
    prior = None
    if resume and os.path.exists(stats_path):
        with open(stats_path) as f:
            prior = json.load(f)
        if prior.get("fingerprint") != fp:
            prior = None  # corpus changed -> full rebuild

    if prior is None:
        write_docids(dim, f"{index_dir}/docids", meta_cols)

    tokens = tokenize(dim, fields).persist(StorageLevel.MEMORY_AND_DISK)

    # ---- corpus stats: avgdl per field = sum(tf)/N (map-side combined agg)
    if prior is None:
        avg_rows = tokens.groupBy("field").agg(F.sum("tf").alias("s")).collect()
        avgdl = {r["field"]: float(r["s"]) / n_docs for r in avg_rows}
        for fname in fields:
            avgdl.setdefault(fname, 1.0)
    else:
        avgdl = prior["avgdl"]

    # ---- df + hot-term detection (Zipf head -> salted encode)
    thr = cfg.index.hot_df_threshold or max(5000, n_docs // 50)
    dfs = tokens.groupBy("field", "term").agg(F.count(F.lit(1)).alias("df"))
    hot_rows = dfs.filter(F.col("df") > thr).collect()
    hot_df = {(r["field"], r["term"]): int(r["df"]) for r in hot_rows}
    vocab_size = dfs.count()

    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "fields": sorted(fields),
        "field_boosts": dict(cfg.bm25.field_boosts),
        "k1": cfg.bm25.k1,
        "b": cfg.bm25.b,
        "n_buckets": cfg.index.n_buckets,
        "chunk_docs": cfg.index.chunk_docs,
        "block_size": cfg.index.block_size,
        "vocab_size": vocab_size,
        "n_hot_terms": len(hot_df),
        "hot_df_threshold": thr,
        "fingerprint": fp,
    }

    # ---- salted, bucketed encode in resumable groups
    n_buckets = cfg.index.n_buckets
    groups = cfg.index.bucket_groups
    p_enc = cfg.index.encode_partitions or spark.sparkContext.defaultParallelism
    kernel = _make_encode_kernel(cfg, stats, hot_df)

    hot_keys = list(hot_df)
    if hot_keys:
        hot_dim = F.broadcast(
            spark.createDataFrame(hot_keys, "field string, term string").withColumn("_hot", F.lit(1))
        )
    base = tokens.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    if hot_keys:
        base = base.join(hot_dim, ["field", "term"], "left")
        salt = F.when(
            F.col("_hot") == 1,
            F.pmod((F.col("docnum") / F.lit(cfg.index.chunk_docs)).cast("long"), F.lit(cfg.index.hot_salts)),
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    base = base.withColumn("_key", F.xxhash64("term", salt.cast("long")))

    group_metrics = []
    for g in range(groups):
        man_path = f"{index_dir}/_manifest/group_{g}.json"
        if resume and os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("fingerprint") == fp:
                man["skipped"] = True
                group_metrics.append(man)
                continue
        tg = time.time()
        sel = base.filter(F.pmod(F.col("bucket"), F.lit(groups)) == g)
        enc = (
            sel.repartition(p_enc, "_key")
            .sortWithinPartitions("field", "term", "docnum")
            .select("bucket", "field", "term", "docnum", "tf", "dl")
            .mapInPandas(kernel, schema=POSTINGS_SCHEMA)
        )
        out_path = f"{index_dir}/postings/group={g}"
        enc.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
        wall = time.time() - tg
        agg = (
            spark.read.parquet(out_path)
            .groupBy("bucket")
            .agg(
                F.sum("n").alias("postings"),
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.length("docs") + F.length("tfs") + F.length("dls")).alias("bytes"),
            )
            .agg(
                F.sum("postings").alias("postings"),
                F.sum("rows").alias("rows"),
                F.sum("bytes").alias("bytes"),
                F.max("postings").alias("max_bucket"),
                F.avg("postings").alias("avg_bucket"),
            )
            .collect()[0]
        )
        man = {
            "group": g,
            "fingerprint": fp,
            "wall_s": round(wall, 3),
            "postings": int(agg["postings"] or 0),
            "rows": int(agg["rows"] or 0),
            "compressed_bytes": int(agg["bytes"] or 0),
            "postings_per_sec": round((agg["postings"] or 0) / max(wall, 1e-9), 1),
            "skew_ratio": round(float(agg["max_bucket"] or 0) / max(float(agg["avg_bucket"] or 1), 1e-9), 3),
            "skipped": False,
        }
        with open(man_path, "w") as f:
            json.dump(man, f, indent=1)
        group_metrics.append(man)

    tokens.unpersist()
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=1)

    wall = time.time() - t0
    built = [m for m in group_metrics if not m.get("skipped")]
    metrics = {
        "wall_s": round(wall, 3),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / max(wall, 1e-9), 1),
        "postings": sum(m["postings"] for m in group_metrics),
        "compressed_bytes": sum(m["compressed_bytes"] for m in group_metrics),
        "vocab_size": vocab_size,
        "n_hot_terms": len(hot_df),
        "groups_built": len(built),
        "groups_skipped": groups - len(built),
        "groups": group_metrics,
    }
    with open(f"{index_dir}/_manifest/build.json", "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics

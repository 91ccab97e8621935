"""Dense, deterministic docnum assignment — scale-safe (no global sort,
no single-partition window).

Postings compress best over dense sorted ints (codecs.py gap encoding), so
docs get int64 docnums 0..N-1.  Strategy: hash-repartition by doc_id, sort
within partitions, count per partition, cumulative offsets on the driver
(one tiny collect of `partitions` longs), then offset + intra-partition
row index via mapInPandas.  Deterministic because the hash partitioner and
the intra-partition sort key (unique doc_id) are both deterministic.

(Whoosh's analog is the segment-internal docnum, assigned in insertion
order by the writer the reference drives at src/index/build_bm25.py:36-41.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_docnums(
    df: DataFrame, id_col: str = "doc_id", partitions: int | None = None
) -> tuple[DataFrame, dict]:
    """Return (df + dense ``docnum`` long column (0..N-1), fingerprint).

    The per-partition counts job doubles as the corpus fingerprint pass
    (row count + order-independent xor of id hashes) so lineage costs no
    extra scan.  The result's partitions are docnum-range-contiguous and
    sorted — downstream range writes need no repartitionByRange.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    h = (
        df.repartition(partitions, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rows = (
        h.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("c"), F.expr(f"bit_xor(xxhash64({id_col}))").alias("x"))
        .collect()
    )
    counts = {r["_pid"]: r["c"] for r in rows}
    xor = 0
    for r in rows:
        xor ^= int(r["x"] or 0)
    fingerprint = {"n_docs": int(sum(counts.values())), "id_hash_xor": xor}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)
    # fresh StructType: .add() would mutate the DataFrame's cached schema
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("docnum", T.LongType())])

    def number(it):
        seen = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            off = bc.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["docnum"] = np.arange(off + seen, off + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return h.mapInPandas(number, schema=out_schema), fingerprint


def write_docids(dim: DataFrame, path: str, meta_cols: tuple[str, ...] = ()) -> None:
    """Persist the (docnum -> doc_id [+meta]) dimension.  assign_docnums
    partitions are already docnum-range-contiguous and sorted, so a plain
    write keeps row-group pruning on docnum with no extra shuffle."""
    cols = ["docnum", "doc_id", *meta_cols]
    dim.select(*cols).write.mode("overwrite").parquet(path)

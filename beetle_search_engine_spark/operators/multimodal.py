"""Multimodal column plumbing: opaque binary payloads + typed metadata.

No counterpart in the reference (it stores raw HTML one file per doc,
src/ETL/download_html.py:32-38); this is the large-scale training-data
shape: media as ``binary`` columns with a typed metadata struct, processed
by Arrow-batched ``mapInPandas`` kernels.  The image/audio codec libraries
are not in this container, so the *decode* step is stubbed behind
``BEETLE_FAKE_DECODE`` — a deterministic fake that derives pixel/sample
statistics from the payload bytes — while everything Spark-side (schema,
batch shape, partitioning, UDF signatures) is real and tested.  Swapping
in PIL/torchaudio later changes only the inner function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, sha string, "
    "feature array<float>, thumb_w int, thumb_h int"
)


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    kinds = F.element_at(F.lit(["image", "audio", "video"]), (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"))
    payload = F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(seed))), 512).cast("binary")
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
            F.lit("fake/v0").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a float feature
    vector from the payload digest.  Replace with PIL/librosa/ffmpeg when
    available — the Spark plumbing around it is unchanged."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(
    media: DataFrame,
    dim: int = 8,
    thumb: tuple[int, int] = (64, 64),
    decoder_factory=None,
) -> DataFrame:
    """Decode + featurize + "resize" each payload in Arrow batches.

    ``decoder_factory`` is the model-injection seam (same shape as the
    reranker's, plans/pipeline.py): a zero-arg callable run ONCE PER TASK
    on the executor (lazy model singleton — the pattern the reference
    uses for SPLADE, src/search/search_splade.py:22-29) returning
    ``decode(payload: bytes, dim: int) -> np.ndarray``.  Default is the
    deterministic sandbox fake; drop in a real PIL/torchaudio decoder
    without touching the operator."""
    tw, th = thumb

    def kernel(batches):
        decode = (decoder_factory or (lambda: _fake_decode))()
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                decode(bytes(p), dim).tolist() if p is not None else None
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "sha": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                    ),
                    "feature": feats,
                    "thumb_w": np.full(len(pdf), tw, dtype=np.int32),
                    "thumb_h": np.full(len(pdf), th, dtype=np.int32),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled timestamp
    (frame decode itself is the stubbed step).  Pure column expressions —
    the explode happens JVM-side."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )

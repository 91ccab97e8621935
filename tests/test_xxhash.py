"""Parity: pure-Python XXH64 == Spark xxhash64 (seed 42) on strings, and
the pmod bucket assignment matches the one the index build writes."""

from pyspark.sql import functions as F

from beetle_search_engine_spark.functions.xxhash import pmod_bucket, spark_xxhash64_str

SAMPLES = [
    "", "a", "ab", "abc", "abcd", "abcde", "transform", "model", "spark",
    "x" * 7, "y" * 8, "z" * 9, "w" * 31, "v" * 32, "u" * 33, "t" * 100,
    "file_7.py", "3.14", "café", "naïve-token", "fn_12345",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string").select(
        "s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(64)).alias("b")
    )
    for r in df.collect():
        assert spark_xxhash64_str(r["s"]) == r["h"], r["s"]
        assert pmod_bucket(r["s"], 64) == r["b"], r["s"]

"""F19/F20: map_from_arrays sparse-vector shape and JSON encode/decode —
the reference represents SPLADE vectors as {term: weight} dicts
(build_splade.py:31) serialized as JSON (build_splade.py:57-63); storage
here is parquet-first by design, but the operators exist and roundtrip."""

from pyspark.sql import functions as F

from beetle_search_engine_spark.operators.textops import term_frequencies
from beetle_search_engine_spark.sources.corpus import load_documents


def test_sparse_vec_as_map_and_json_roundtrip(spark):
    docs = load_documents(spark, "/root/testdata/sf0.001").limit(50)
    tf = term_frequencies(docs)
    # F19: {term -> tf} map per doc (the reference's dict(zip(cols, weights)))
    vec = (
        tf.groupBy("doc_id")
        .agg(
            F.map_from_arrays(
                F.collect_list("term"), F.collect_list(F.col("tf").cast("double"))
            ).alias("sparse_vec")
        )
    )
    # F20: JSON encode -> decode roundtrip
    js = vec.select("doc_id", F.to_json(F.struct("sparse_vec")).alias("j"))
    back = js.select(
        "doc_id",
        F.from_json(F.col("j"), "struct<sparse_vec: map<string, double>>")["sparse_vec"].alias("v"),
    )
    orig = {r["doc_id"]: dict(r["sparse_vec"]) for r in vec.collect()}
    got = {r["doc_id"]: dict(r["v"]) for r in back.collect()}
    assert got == orig and len(got) == 50

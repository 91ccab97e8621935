"""JVM tokenizer chain == Python reference chain, row for row, on the
synthetic graft corpus and the testdata documents table."""

from beetle_search_engine_spark.operators.docnums import assign_docnums
from beetle_search_engine_spark.operators.tokenize import tokenize_jvm, tokenize_python
from beetle_search_engine_spark.sources.corpus import documents_as_corpus, generate_corpus


def _rows(df):
    return sorted((r["docnum"], r["field"], r["term"], r["tf"], r["dl"]) for r in df.collect())


def test_parity_on_graft_corpus(spark, tmp_path):
    corpus, _ = assign_docnums(generate_corpus(spark, 250, seed=13), str(tmp_path / "h"))
    fields = {"title": "path", "body": "content"}
    assert _rows(tokenize_jvm(corpus, fields)) == _rows(tokenize_python(corpus, fields))


def test_parity_on_testdata_documents(spark, tmp_path):
    corpus, _ = assign_docnums(
        documents_as_corpus(spark, "/root/testdata/sf0.001"), str(tmp_path / "h")
    )
    fields = {"body": "content"}
    assert _rows(tokenize_jvm(corpus, fields)) == _rows(tokenize_python(corpus, fields))

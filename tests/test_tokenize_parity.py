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


def test_parity_sql_analyzer(spark, tmp_path):
    corpus, _ = assign_docnums(generate_corpus(spark, 150, seed=5), str(tmp_path / "h3"))
    fields = {"body": "content"}
    a = tokenize_jvm(corpus, fields, analyzer_name="sql")
    b = tokenize_python(corpus, fields, analyzer_name="sql")
    assert _rows(a) == _rows(b)


def test_parity_positions(spark, tmp_path):
    corpus, _ = assign_docnums(generate_corpus(spark, 120, seed=7), str(tmp_path / "h4"))
    fields = {"title": "path", "body": "content"}

    def rows(df):
        return sorted(
            (r["docnum"], r["field"], r["term"], r["tf"], r["dl"], tuple(r["pos"]))
            for r in df.collect()
        )

    a = tokenize_jvm(corpus, fields, positions=True)
    b = tokenize_python(corpus, fields, positions=True)
    assert rows(a) == rows(b)


def test_parity_shuffle_join_stems(spark, tmp_path):
    """broadcast vs shuffle stem attach: identical token rows."""
    corpus, _ = assign_docnums(generate_corpus(spark, 100, seed=3), str(tmp_path / "h5"))
    fields = {"body": "content"}
    a = tokenize_jvm(corpus, fields, broadcast_stems=True)
    b = tokenize_jvm(corpus, fields, broadcast_stems=False)
    assert _rows(a) == _rows(b)

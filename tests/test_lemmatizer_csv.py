"""T6 lemmatizer stand-in + S9/S10 CSV label sink/scan roundtrip."""

from beetle_search_engine_spark.functions.lemmatizer import lemmatize, lemmatize_tokens
from beetle_search_engine_spark.operators.textops import heuristic_label
from beetle_search_engine_spark.sources.corpus import load_documents


def test_lemmatize_nouns():
    assert lemmatize("models") == "model"
    assert lemmatize("classes") == "class"
    assert lemmatize("boxes") == "box"
    assert lemmatize("studies") == "study"
    assert lemmatize("indices") == "index"
    assert lemmatize("children") == "child"
    assert lemmatize("pass") == "pass"      # -ss kept
    assert lemmatize("was") == "be"         # irregular


def test_lemmatize_vowel_s_nouns():
    # -se nouns keep their e via the vowel gate on ('ses','s')...
    assert lemmatize("houses") == "house"
    assert lemmatize("causes") == "cause"
    assert lemmatize("senses") == "sens"    # consonant+ses -> clipped
    # ...while listed vowel+s nouns don't get a spurious 'e'
    assert lemmatize("buses") == "bus"
    assert lemmatize("gases") == "gas"
    assert lemmatize("viruses") == "virus"
    assert lemmatize("lenses") == "lens"
    assert lemmatize("statuses") == "status"


def test_lemmatize_verbs():
    assert lemmatize("running") == "run"    # degemination
    assert lemmatize("stopped") == "stop"
    assert lemmatize("parsed") == "pars"    # dictionary-free: consistent, not perfect
    assert lemmatize("go") == "go"


def test_lemmatize_idempotent_enough():
    # the TF-IDF sidecar only needs a CONSISTENT mapping
    words = ["tables", "tokens", "queries", "indexed", "scanning", "data"]
    once = lemmatize_tokens(words)
    assert lemmatize_tokens(once) == [lemmatize(w) for w in once]


def test_csv_label_sink_scan_roundtrip(spark, tmp_path):
    """S9/S10: the reference's label CSVs (heuristic_label.py:169-183,
    train_tfidf.py:81-84) as spark.write/read.csv with explicit schema."""
    labels = heuristic_label(load_documents(spark, "/root/testdata/sf0.001"))
    path = str(tmp_path / "weak_labels_csv")
    labels.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema("doc_id long, score int, label string, reasoning string").option(
        "header", True
    ).csv(path)
    a = sorted(tuple(r) for r in labels.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_lemma_sql_parity_with_python():
    """The GENERATED DuckDB lemmatizer (__spark_entry__._lemma_case_sql)
    must agree with functions.lemmatizer.lemmatize token-for-token —
    battery covers every rule branch + fuzz from the testdata vocab."""
    import duckdb

    from __spark_entry__ import _lemma_case_sql
    from beetle_search_engine_spark.functions.lemmatizer import _IRREGULAR

    battery = [
        "models", "classes", "boxes", "studies", "churches", "wishes",
        "quizzes", "senses", "houses", "causes", "buses", "gases",
        "viruses", "lenses", "statuses", "pass", "was", "is", "running",
        "stopped", "parsed", "scanning", "go", "ing", "ed", "xes", "zes",
        "ies", "ses", "sses", "dies", "ties", "as", "us", "xs", "abs",
        "falls", "passes", "tables", "queries", "indexed", "data",
        "filters", "strings", "killed", "rolling", "freed", "seed",
        "speed", "agreed", "shed", "sledding", "bed", "added",
    ] + list(_IRREGULAR)
    # fuzz: every token in the sf0.001 corpus vocabulary
    import pyarrow.dataset as ds
    import re
    t = ds.dataset("/root/testdata/sf0.001/documents.parquet").to_table(columns=["text"])
    vocab = set()
    for txt in t.column("text").to_pylist()[:200]:
        vocab.update(re.findall(r"[a-z0-9_]+", (txt or "").lower()))
    battery += sorted(vocab)

    con = duckdb.connect()
    expr = _lemma_case_sql("t")
    vals = ", ".join(f"('{w}')" for w in battery)
    got = con.sql(
        f"SELECT t, {expr} AS lem FROM (VALUES {vals}) AS _v(t)"
    ).fetchall()
    for w, lem_sql in got:
        assert lem_sql == lemmatize(w), (w, lem_sql, lemmatize(w))

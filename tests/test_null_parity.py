"""Null-text robustness: queries() entries that tokenize/measure text must
match their DuckDB oracles even when the documents table contains NULL
text (Spark's size(NULL) = -1 legacy vs SQL NULL is the classic trap; the
driver fixtures happen to contain no nulls, so this injects one)."""

import shutil

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SRC = "/root/testdata/sf0.001"
ENTRIES = [
    "token_tf", "doc_lengths", "corpus_stats", "text_quality",
    "lang_id", "doc_fingerprint", "scalar_funcs", "heuristic_label",
]


@pytest.fixture(scope="module")
def nulled_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nulled")
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    extra = pd.DataFrame(
        [
            {"doc_id": 99901, "text": None, "lang": "en", "source": "src0", "n_chars": 0},
            {"doc_id": 99902, "text": "", "lang": "de", "source": "src1", "n_chars": 0},
        ]
    )
    pd.concat([docs, extra], ignore_index=True).to_parquet(d / "documents.parquet")
    return str(d)


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ENTRIES)
def test_null_text_parity(spark, nulled_dir, name):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{nulled_dir}/{t}.parquet'")
    got = entrymod.queries()[name](spark, nulled_dir).toPandas()
    want = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), f"{len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    assert g.equals(w), f"mismatch:\n{g.compare(w) if g.shape == w.shape else (g, w)}"

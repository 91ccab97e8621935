"""Corpus tokenization -> token rows (docnum, field, term, tf, dl).

Two implementations of the same Whoosh analyzer semantics:

* :func:`tokenize_jvm` (default) — T1-T3 (regex tokenize, lowercase,
  stop/minsize) run as Catalyst expressions (codegen, no Python in the
  per-token path); T4 (Porter) runs in Python over the batch's *distinct*
  tokens only — a vocabulary-sized dimension, ~3 orders of magnitude
  smaller than the token stream — then a join + re-aggregation merges
  tokens that stem to the same term.  This keeps the memory-bandwidth-
  heavy string work in the JVM, which matters both for absolute speed and
  for parallel scaling (Python string churn saturates a node's memory
  bandwidth long before its cores).

* :func:`tokenize_python` — the whole T1-T4 chain per document inside
  mapInPandas (SURVEY.md M6).  Shares functions/analyzer.py with the
  pure-Python oracle, so it is the semantic reference; a parity test pins
  the JVM path to it.

``dl`` (post-stop-filter token count == Whoosh field length; stemming
doesn't change counts) rides along as a column so the index embeds doc
lengths and query time needs no doclen join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import STOP_WORDS, analyze_tf
from ..functions.porter import stem

TOKENS_SCHEMA = "docnum long, field string, term string, tf int, dl int"

# Java regex equivalent of the Whoosh tokenizer pattern; (?U) switches \w
# to unicode word classes to match Python re's default.
JVM_TOKEN_PATTERN = r"(?U)\w+(?:\.?\w+)*"


def tokenize_jvm(corpus: DataFrame, fields: dict[str, str]) -> DataFrame:
    """JVM tokenize/stop + distinct-token Python stemming."""
    parts = []
    for fname, col in sorted(fields.items()):
        toks = F.filter(
            F.regexp_extract_all(F.lower(F.col(col)), F.lit(JVM_TOKEN_PATTERN), 0),
            lambda t: (F.length(t) >= 2) & ~t.isin(*sorted(STOP_WORDS)),
        )
        # Materialize the token array as a named column in its own
        # projection BEFORE exploding.  Inlining the regex expression into
        # both size() and explode() lets Catalyst place the (expensive)
        # regex above the Generate, re-evaluating it once per exploded
        # OUTPUT row — observed as a ~100x tokenize blowup.  A column
        # reference is cheap to duplicate; the regex runs once per doc.
        pre = corpus.select("docnum", F.lit(fname).alias("field"), toks.alias("toks"))
        parts.append(
            pre.select(
                "docnum",
                "field",
                F.size("toks").alias("dl"),
                F.explode("toks").alias("token"),
            )
        )
    exploded = parts[0]
    for p in parts[1:]:
        exploded = exploded.unionByName(p)

    def stem_batch(batches):
        for pdf in batches:
            yield pd.DataFrame({"token": pdf["token"], "term": [stem(t) for t in pdf["token"]]})

    # vocabulary-sized dimension (distinct is map-side combined); broadcast
    # keeps the stem attach map-side, so the whole tokenize costs ONE
    # shuffle (the tf aggregation).  At vocabularies too large to
    # broadcast, swap for a shuffle join on token — same semantics.
    stems = F.broadcast(
        exploded.select("token").distinct().mapInPandas(stem_batch, "token string, term string")
    )
    return (
        exploded.join(stems, "token")
        .groupBy("docnum", "field", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"), F.first("dl").alias("dl"))
        .select("docnum", "field", "term", "tf", "dl")
    )


def tokenize_python(corpus: DataFrame, fields: dict[str, str]) -> DataFrame:
    """fields: index-field name -> source column name.

    e.g. {"title": "path", "body": "content"} for the graft corpus
    (mirrors the reference's two-field schema, build_bm25.py:7-13), or
    {"body": "text"} for the testdata documents table.
    """
    src_cols = sorted(set(fields.values()))
    field_items = sorted(fields.items())

    def kernel(batches):
        for pdf in batches:
            docnums = pdf["docnum"].to_numpy()
            out_doc, out_field, out_term, out_tf, out_dl = [], [], [], [], []
            for fname, col in field_items:
                texts = pdf[col]
                for dn, text in zip(docnums, texts):
                    tf = analyze_tf(text if isinstance(text, str) else "")
                    if not tf:
                        continue
                    k = len(tf)
                    dl = sum(tf.values())
                    out_doc.append(np.full(k, dn, dtype=np.int64))
                    out_field.extend([fname] * k)
                    out_term.extend(tf.keys())
                    out_tf.append(np.fromiter(tf.values(), dtype=np.int32, count=k))
                    out_dl.append(np.full(k, dl, dtype=np.int32))
            if not out_doc:
                continue
            yield pd.DataFrame(
                {
                    "docnum": np.concatenate(out_doc),
                    "field": out_field,
                    "term": out_term,
                    "tf": np.concatenate(out_tf),
                    "dl": np.concatenate(out_dl),
                }
            )

    return corpus.select("docnum", *src_cols).mapInPandas(kernel, schema=TOKENS_SCHEMA)


def tokenize(corpus: DataFrame, fields: dict[str, str], impl: str = "jvm") -> DataFrame:
    return tokenize_jvm(corpus, fields) if impl == "jvm" else tokenize_python(corpus, fields)

"""Corpus tokenization -> token rows (docnum, field, term, tf, dl).

The one mandatory Python stage of the engine (SURVEY.md M6): the
Whoosh-semantics analyzer (functions/analyzer.py) runs inside mapInPandas
over Arrow batches — per-document Python, never per-token DataFrame rows:
term frequencies are pre-aggregated in the UDF (SURVEY.md A1) so the
exploded row count is distinct-terms-per-doc, not tokens-per-doc, and the
doc field length ``dl`` rides along as a column (constant per doc-field),
which later lets the index embed doc lengths and keeps query time free of
any doclen join/shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.analyzer import analyze_tf

TOKENS_SCHEMA = "docnum long, field string, term string, tf int, dl int"


def tokenize(corpus: DataFrame, fields: dict[str, str]) -> DataFrame:
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

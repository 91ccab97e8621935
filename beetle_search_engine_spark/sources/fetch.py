"""Distributed HTTP fetch pattern (SURVEY S2/S4) — transport injected.

The reference fetches pages with requests, single-process: the crawler
page-by-page (src/ETL/website_crawler.py:36-40) and the downloader with a
4-thread pool (src/ETL/download_html.py:47-66, max_workers from
params.yaml:2-3).  The Spark-native shape of that fan-out is *partition
parallelism*: one long-lived session per task, rows streamed through it
in Arrow batches — concurrency is `repartition(n)`, not a thread pool.

This sandbox has no network, and the graft's corpus arrives as a table
(BASELINE.json input_hint), so the TRANSPORT is an injected factory —
the same seam shape as the reranker/encoder/decoder factories:
``fetcher_factory() -> fetch(url: str) -> (status:int, content_type:str,
body:bytes|None)`` constructed ONCE PER TASK (the executor-side lazy
singleton the reference itself uses for models).  Drop in a
requests.Session-backed fetcher on a real cluster; tests inject a
deterministic fake.

The reference's response filter (status==200 and 'text/html' in
Content-Type, website_crawler.py:37-40 / download_html.py:26-30) is a
pure column predicate over the fetch output — see :func:`html_ok`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = "url string, status int, content_type string, body binary"


def fetch_urls(
    urls: DataFrame,
    fetcher_factory,
    url_col: str = "url",
    partitions: int | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(url, status, content_type, body[, *carry]) — one fetcher per
    task, rows streamed through it.  ``partitions`` is the concurrency
    knob (the reference's max_workers analog); default keeps the input
    layout.  ``carry`` names input columns passed through unchanged
    (e.g. the crawler's seed/depth) so callers don't re-join on url —
    a url reachable from two seeds would fan out under a join."""
    cols = [F.col(url_col).alias("url"), *(F.col(c) for c in carry)]
    src = urls.select(*cols)
    if partitions:
        src = src.repartition(partitions)
    carry_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name != "url"
    )

    def kernel(batches):
        fetch = fetcher_factory()  # once per task: session/connection pool
        for pdf in batches:
            out = {"url": [], "status": [], "content_type": [], "body": []}
            for u in pdf["url"]:
                status, ctype, body = fetch(u)
                out["url"].append(u)
                out["status"].append(int(status))
                out["content_type"].append(ctype)
                out["body"].append(body)
            res = pd.DataFrame(out)
            for c in carry:
                res[c] = pdf[c].to_numpy()
            yield res

    return src.mapInPandas(kernel, schema=FETCH_SCHEMA + carry_schema)


def html_ok() -> F.Column:
    """The reference's keep-predicate: HTTP 200 + text/html content type
    (SURVEY P5), as a pure column expression over fetch_urls output."""
    return (F.col("status") == 200) & F.coalesce(
        F.col("content_type").contains("text/html"), F.lit(False)
    )

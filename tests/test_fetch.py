"""S2/S4 distributed fetch pattern with an injected transport (no
network in the sandbox; a real requests.Session fetcher drops into the
same seam)."""

import hashlib

from beetle_search_engine_spark.sources.fetch import fetch_urls, html_ok


def _fake_fetcher_factory():
    def fetch(url: str):
        # deterministic fake transport: /missing -> 404, /img -> png,
        # everything else an html page derived from the url
        if url.endswith("/missing"):
            return 404, "text/plain", None
        if url.endswith(".png"):
            return 200, "image/png", b"\x89PNG" + hashlib.md5(url.encode()).digest()
        return 200, "text/html; charset=utf-8", f"<html>{url}</html>".encode()

    return fetch


def test_fetch_urls_and_filter(spark):
    urls = spark.createDataFrame(
        [("https://a.com/page1",), ("https://a.com/missing",), ("https://a.com/logo.png",)],
        "url string",
    )
    out = fetch_urls(urls, _fake_fetcher_factory, partitions=2)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["https://a.com/missing"]["status"] == 404
    assert rows["https://a.com/logo.png"]["content_type"] == "image/png"
    assert bytes(rows["https://a.com/page1"]["body"]) == b"<html>https://a.com/page1</html>"
    kept = [r["url"] for r in out.filter(html_ok()).collect()]
    assert kept == ["https://a.com/page1"]


def test_fetch_store_parse_pipeline(spark):
    """The reference's download->parse chain shape: fetch, filter, store
    content keyed by sha256(url) (download_html.py:17-19,33)."""
    from pyspark.sql import functions as F

    urls = spark.createDataFrame([(f"https://x.com/p{i}",) for i in range(10)], "url string")
    pages = fetch_urls(urls, _fake_fetcher_factory).filter(html_ok())
    stored = pages.select(
        F.sha2("url", 256).alias("doc_id"), F.col("body").cast("string").alias("html")
    )
    rows = stored.collect()
    assert len(rows) == 10 and all(len(r["doc_id"]) == 64 for r in rows)

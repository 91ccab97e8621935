"""F11 urljoin/canonicalize, P6 same-domain, A10 URL-pattern scorer."""

from pyspark.sql import functions as F

from beetle_search_engine_spark.functions.urls import (
    canonicalize_url,
    same_domain,
    url_pattern_score,
    urljoin_canonical,
)


def test_canonicalize_pure():
    assert canonicalize_url("HTTP://Example.COM:80/a#frag") == "http://example.com/a"
    assert canonicalize_url("https://ex.com:443/p?b=2&a=1") == "https://ex.com/p?a=1&b=2"
    assert canonicalize_url("https://ex.com:8443/p") == "https://ex.com:8443/p"
    assert canonicalize_url("https://ex.com") == "https://ex.com/"


def test_urljoin_canonical_udf(spark):
    df = spark.createDataFrame(
        [
            ("https://Ex.com/dir/page.html", "../other?z=1&a=2#x"),
            ("https://ex.com/a/", "b/c"),
            ("https://ex.com/a/", "https://Other.ORG:443/abs"),
        ],
        "base string, href string",
    )
    rows = [r["u"] for r in df.select(urljoin_canonical("base", "href").alias("u")).collect()]
    assert rows == [
        "https://ex.com/other?a=2&z=1",
        "https://ex.com/a/b/c",
        "https://other.org/abs",
    ]


def test_same_domain_predicate(spark):
    df = spark.createDataFrame(
        [
            ("https://A.com/x", "https://a.com/y", True),
            ("https://a.com/x", "https://b.com/x", False),
        ],
        "u1 string, u2 string, want boolean",
    )
    got = df.select(same_domain(F.col("u1"), F.col("u2")).alias("g"), "want").collect()
    assert all(r["g"] == r["want"] for r in got)


def test_url_pattern_score_first_match_only(spark):
    patterns = [(r"/blog/", 8), (r"/(tag|category)/", -8), (r"/about", -5)]
    df = spark.createDataFrame(
        [
            ("https://x.com/blog/post-1", 8),
            ("https://x.com/tag/blog/", -8),   # first matching row wins... blog matches first
            ("https://x.com/about", -5),
            ("https://x.com/docs", 0),
        ],
        "url string, want int",
    )
    got = df.select(url_pattern_score(F.col("url"), patterns).alias("s"), "want", "url").collect()
    for r in got:
        if "tag/blog" in r["url"]:
            # when-chain order: '/blog/' is evaluated first and matches
            assert r["s"] == 8
        else:
            assert r["s"] == r["want"], r["url"]


def test_url_pattern_score_matches_host_and_scheme(spark):
    # the reference lowercases and matches the FULL URL — host rules and
    # scheme anchors must work (a path-only reduction never matched them)
    patterns = [(r"docs\.example\.com", 5), (r"^https://blog", 3)]
    df = spark.createDataFrame(
        [
            ("https://docs.example.com/x", 5),
            ("https://blog.example.com/post", 3),
            ("https://example.com/docs", 0),
        ],
        "url string, want int",
    )
    got = df.select(url_pattern_score(F.col("url"), patterns).alias("s"), "want").collect()
    for r in got:
        assert r["s"] == r["want"]


def test_same_domain_compares_full_netloc(spark):
    """The reference compares urlparse().netloc (host + explicit port),
    so a cross-port link is a DIFFERENT domain — host-only comparison
    let it into the crawl frontier (round-6 review fix)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("https://a.com/x", "https://a.com:8443/admin", False),
            ("https://a.com:8443/x", "https://a.com:8443/y", True),
        ],
        "u1 string, u2 string, want boolean",
    )
    got = df.select(same_domain(F.col("u1"), F.col("u2")).alias("g"), "want").collect()
    assert all(r["g"] == r["want"] for r in got)

"""S2-S4 iterative BFS crawl frontier over a fake site graph (reference:
src/ETL/website_crawler.py:19-57).  The injected transport serves a
deterministic multi-hop graph with cycles, cross-domain links, failures
and non-html responses — exercising visited-set dedup, depth limits,
per-seed budgets and the same-domain predicate."""


from beetle_search_engine_spark.sources.crawler import crawl_frontier

# a.com: 0 -> (1, 2) -> 1:(3, 0 cycle, b.com/x cross-domain), 2:(4, img)
#        3 -> (5-missing), 4 -> ()
# b.com: root -> (p1, p2); p1 -> (p2 duplicate)
SITE = {
    "https://a.com/": (200, "text/html", b'<a href="/1">x</a><a href="/2">y</a>'),
    "https://a.com/1": (
        200, "text/html",
        b'<a href="/3">z</a><a href="/">cycle</a><a href="https://b.com/x">ext</a>',
    ),
    "https://a.com/2": (200, "text/html", b'<a href="/4">w</a><a href="/i.png">img</a>'),
    "https://a.com/3": (200, "text/html", b'<a href="/missing">gone</a>'),
    "https://a.com/4": (200, "text/html", b""),
    "https://a.com/i.png": (200, "image/png", b"\x89PNG"),
    "https://b.com/": (200, "text/html", b'<A HREF="/p1">1</A><a href=\'/p2\'>2</a>'),
    "https://b.com/p1": (200, "text/html", b'<a href="/p2">again</a>'),
    "https://b.com/p2": (200, "text/html", b""),
}


def _graph_fetcher_factory():
    def fetch(url: str):
        hit = SITE.get(url)
        if hit is None:
            return 404, "text/plain", None
        return hit

    return fetch


def _by_seed(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["seed"], {})[r["url"]] = r["depth"]
    return out


def test_crawl_multi_hop_expansion(spark):
    res = crawl_frontier(
        spark, ["a.com"], _graph_fetcher_factory, max_depth=3, max_urls=100
    )
    got = _by_seed(res)["https://a.com/"]
    # /i.png fetched but dropped (not html); /missing fetched, 404;
    # b.com/x dropped by same_domain; cycle to / deduped by visited
    assert got == {
        "https://a.com/": 0,
        "https://a.com/1": 1,
        "https://a.com/2": 1,
        "https://a.com/3": 2,
        "https://a.com/4": 2,
    }


def test_crawl_depth_limit(spark):
    res = crawl_frontier(
        spark, ["a.com"], _graph_fetcher_factory, max_depth=1, max_urls=100
    )
    got = _by_seed(res)["https://a.com/"]
    assert set(got) == {"https://a.com/", "https://a.com/1", "https://a.com/2"}
    assert max(got.values()) == 1


def test_crawl_max_urls_budget(spark):
    res = crawl_frontier(
        spark, ["a.com"], _graph_fetcher_factory, max_depth=3, max_urls=3
    )
    rows = res.collect()
    assert len(rows) == 3
    # deterministic cut: within the depth-1 wave, urls rank by url
    assert {r["url"] for r in rows} == {
        "https://a.com/", "https://a.com/1", "https://a.com/2"
    }


def test_crawl_two_seeds_independent_budgets(spark):
    res = crawl_frontier(
        spark, ["a.com", "https://b.com/"], _graph_fetcher_factory,
        max_depth=2, max_urls=2,
    )
    got = _by_seed(res)
    assert len(got["https://a.com/"]) == 2
    assert len(got["https://b.com/"]) == 2
    # b's wave-deduped p2 (linked by both root and p1) appears once
    assert got["https://b.com/"] == {"https://b.com/": 0, "https://b.com/p1": 1}


def test_crawl_failures_do_not_consume_budget(spark):
    # seed page links to a 404 and one good page: budget 2 still yields
    # 2 crawled pages (the 404 is visited but not counted)
    site = {
        "https://c.com/": (200, "text/html", b'<a href="/bad">x</a><a href="/ok">y</a>'),
        "https://c.com/ok": (200, "text/html", b""),
    }

    def factory():
        def fetch(url):
            return site.get(url, (404, "text/plain", None))

        return fetch

    res = crawl_frontier(spark, ["c.com"], factory, max_depth=2, max_urls=2)
    urls = {r["url"] for r in res.collect()}
    assert urls == {"https://c.com/", "https://c.com/ok"}


def test_crawl_custom_link_extractor(spark):
    # parser seam: an extractor that only follows links marked rel=keep
    import re

    def keep_only_factory():
        pat = re.compile(rb'<a rel="keep" href="([^"]+)"')

        def extract(body):
            return [m.decode() for m in pat.findall(body or b"")]

        return extract

    site = {
        "https://d.com/": (
            200, "text/html",
            b'<a rel="keep" href="/yes">y</a><a href="/no">n</a>',
        ),
        "https://d.com/yes": (200, "text/html", b""),
        "https://d.com/no": (200, "text/html", b""),
    }

    def factory():
        def fetch(url):
            return site.get(url, (404, "text/plain", None))

        return fetch

    res = crawl_frontier(
        spark, ["d.com"], factory, max_depth=1, max_urls=10,
        link_extractor_factory=keep_only_factory,
    )
    assert {r["url"] for r in res.collect()} == {"https://d.com/", "https://d.com/yes"}


def test_crawl_empty_seed_list_and_dead_seed(spark):
    assert crawl_frontier(spark, [], _graph_fetcher_factory).count() == 0
    dead = crawl_frontier(spark, ["nope.example"], _graph_fetcher_factory, max_depth=2)
    assert dead.count() == 0  # seed 404s: visited, nothing crawled


def test_crawl_max_urls_zero_is_unlimited(spark):
    """Falsy max_urls = no budget cap, matching the reference's
    `if max_urls and crawled_count >= max_urls` guard — a 0 budget
    previously crawled NOTHING (round-6 review fix)."""
    res = crawl_frontier(
        spark, ["a.com"], _graph_fetcher_factory, max_depth=3, max_urls=0
    )
    got = _by_seed(res)["https://a.com/"]
    assert len(got) == 5  # the whole reachable same-domain html graph

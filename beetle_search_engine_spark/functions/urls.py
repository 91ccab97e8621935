"""URL functions for crawler-shaped pipelines (SURVEY F10/F11, P6, A10).

The reference's crawler joins relative links against the page URL and
canonicalizes them (reference: src/ETL/website_crawler.py:50, urljoin +
w3lib.canonicalize_url) and filters to the seed's domain
(website_crawler.py:15-16,51).  The corpus arrives as a table in this
graft, so these are offered as reusable column functions: Spark has no
urljoin/canonicalize builtin, so those two are an Arrow-batched pandas
UDF over stdlib urllib (the only non-Catalyst members of this module);
the domain predicate and the pattern scorer are pure column expressions.

Canonicalization semantics (the stable core of w3lib's): lowercase
scheme/host, strip fragments, drop default ports, sort query parameters,
normalize an empty path to '/'.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Pure-Python canonicalizer (deterministic, dependency-free).
    Preserves userinfo verbatim and IPv6 bracket literals."""
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    userinfo, sep, _hostport = s.netloc.rpartition("@")
    host = s.hostname.lower() if s.hostname else ""
    if ":" in host:  # IPv6 literal — urlsplit strips the brackets
        host = f"[{host}]"
    port = s.port
    hostport = host if port is None or str(port) == _DEFAULT_PORTS.get(scheme) else f"{host}:{port}"
    path = s.path or "/"
    query = urlencode(sorted(parse_qsl(s.query, keep_blank_values=True)))
    return urlunsplit((scheme, userinfo + sep + hostport, path, query, ""))  # fragment dropped


def urljoin_canonical(base_col, href_col) -> F.Column:
    """F11: urljoin(base, href) + canonicalize, Arrow-batched.  The UDF
    is constructed lazily — pandas_udf parses its DDL against the active
    session, so a module-level decorator would require Spark at import."""

    @pandas_udf("string")
    def _join(base: pd.Series, href: pd.Series) -> pd.Series:
        out = []
        for b, h in zip(base, href):
            try:
                out.append(canonicalize_url(urljoin(b or "", h or "")))
            except ValueError:
                out.append(None)
        return pd.Series(out)

    return _join(base_col, href_col)


def same_domain(url_a, url_b) -> F.Column:
    """P6: case-insensitive NETLOC equality (reference:
    website_crawler.py:15-16 compares urlparse().netloc, which includes
    an explicit port and userinfo — https://a.com:8443 is a DIFFERENT
    domain than https://a.com there, so comparing HOST alone let
    cross-port links into the frontier; round-6 review finding) as a
    pure column expression.  parse_url AUTHORITY == Java's
    userinfo@host:port, the netloc analog."""
    return F.lower(F.parse_url(url_a, F.lit("AUTHORITY"))) == F.lower(
        F.parse_url(url_b, F.lit("AUTHORITY"))
    )


def url_pattern_score(url_col, patterns: list[tuple[str, int]]) -> F.Column:
    """A10: first-match-only regex-table URL scorer (the reference ships
    this shape at src/ETL/heuristic_label.py:14-58 but never calls it —
    ported as a generic when-chain; callers supply their own pattern
    table).  Matching is case-insensitive (the reference lowercases the
    URL first, heuristic_label.py:23; patterns get the (?i) flag so
    caller tables with uppercase letters still match).  Patterns run
    against the FULL lowered URL — the reference matches the whole
    string, so host rules ('docs\\.example\\.com') and scheme anchors
    ('^https://blog') work; a path-only reduction would silently
    never match them.  Returns 0 when nothing matches."""
    expr = None
    target = F.lower(url_col)
    for pat, score in patterns:
        cond = target.rlike(f"(?i){pat}")
        expr = F.when(cond, score) if expr is None else expr.when(cond, score)
    return (expr.otherwise(0) if expr is not None else F.lit(0)).alias("url_score")

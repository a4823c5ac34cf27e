"""URL canonicalization for crawl pipelines.

Every web-scale dedup/link-graph job starts by normalizing URLs — the
same page is crawled as ``HTTP://Site.Example:80/p/1/``,
``http://site.example/p/1?utm_source=feed`` and ``http://site.example/p/1``;
without canonicalization the exact-dedup and host-graph stages fracture.

``normalize_url`` is a pure Column expression (whole-stage codegen, no
UDF): every rule is regexp/split/filter algebra reproducible verbatim in
the DuckDB oracle. Rules (conservative, order matters):

1. drop the fragment (``#...``)
2. lowercase scheme and host (path/query case is preserved — it is
   significant on most servers)
3. strip the scheme's default port (``http://h:80`` / ``https://h:443``)
4. empty path -> ``/``; strip trailing slashes from non-root paths
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``, ``ref``);
   drop the ``?`` if nothing survives
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def normalize_url(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    # 3. default port for the (lowercased) scheme
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    rest = F.regexp_replace(u, _REST_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    # 4. root path, trailing slashes
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # 5. tracking params
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (~kv.rlike(TRACKING_PARAM_RE)) & (kv != ""),
    )
    query = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def normalize_url_sql(url_expr: str) -> str:
    """DuckDB expression computing the identical normalization (oracle
    twin; keep rule-for-rule in sync with :func:`normalize_url`)."""
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    host0 = f"lower(regexp_extract({u}, '{_HOST_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END"
    )
    rest = f"regexp_replace({u}, '{_REST_RE}', '')"
    path0 = f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1), '/+$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query0 = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    kept = (
        f"list_filter(string_split({query0}, '&'), "
        f"x -> NOT regexp_matches(x, '{TRACKING_PARAM_RE}') AND x <> '')"
    )
    # DuckDB array_to_string([]) is NULL where Spark array_join([]) is ''
    query = f"coalesce(array_to_string({kept}, '&'), '')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END"
    )


def url_path_template(url: Column | str) -> Column:
    """Generalize a URL path into its route template: long hex runs
    (ids/hashes, >= 8 chars) become ``{hex}`` and digit runs become
    ``{n}``, so ``/p/123`` and ``/p/987`` collapse to ``/p/{n}``. The
    crawler-side pattern miner: template cardinality per host drives
    crawl-frontier dedup ("this site has 3 routes, not 3M pages") and
    spider-trap detection. Pure regexp algebra (whole-stage codegen);
    every pattern is RE2-safe so the DuckDB oracle replays it verbatim.
    Hex first, digits second, both word-bounded: an 8+-char hex run
    (``deadbeef01``, and yes ``12345678`` — a long digit run is an id
    either way) is ``{hex}``; shorter digit runs are ``{n}``."""
    u = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"\b[0-9a-f]{8,}\b", "{hex}")
    path = F.regexp_replace(path, r"[0-9]+", "{n}")
    return path


def url_template_stats(df, url_col: str = "url"):
    """Per-(host, path-template) URL counts over a pages/frontier table:
    one regexp projection + one codegen hash aggregate — at 100 TB the
    result is |hosts| x |routes| rows, tiny, and the aggregation key
    spreads a mega-host's URLs across partitions by template.

    Returns ``(host, template, n_urls)``."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    return (
        df.select(host.alias("host"), url_path_template(u).alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )

"""URL canonicalization + URL-level dedup for web-crawl pipelines —
RFC 3986 §6 syntax-based normalization (case of scheme/host, default
ports, empty path → "/") plus the crawl-dedup conventions every CDX /
WARC pipeline applies: strip the fragment, drop tracking parameters
(utm_*, gclid, fbclid, msclkid, ref), and sort the surviving query
parameters so param order doesn't split identical pages.

All pure JVM string/array expressions (regexp_extract / split / filter /
array_sort / concat) — whole-stage codegen, zero shuffles for the
canonical form; the dedup is one map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref)="

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column: lowercase scheme + host, default
    port dropped (:80 http / :443 https), fragment stripped, tracking
    params dropped, remaining query params sorted, empty path → '/'.
    Non-URL strings (no scheme) pass through lowercased-scheme-free
    unchanged."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)
    # default-port strip is scheme-aware
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = (F.when((scheme == "http") & host.endswith(":80"),
                   F.substring_index(host, ":", 1))
            .when((scheme == "https") & host.endswith(":443"),
                  F.substring_index(host, ":", 1))
            .otherwise(host))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qnorm = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"),
                            F.concat_ws("&", F.array_sort(params))))
    return F.when(
        scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path,
                 F.coalesce(qnorm, F.lit(""))))


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, canonical_url(url_col))


def url_dedup(df: DataFrame, url_col: str = "url",
              key: str = "doc_id") -> DataFrame:
    """Keep one row per canonical URL — the lowest key wins
    (deterministic, order-free). One groupBy + one semi-join, both on
    the canonical hash; map-side combinable, 100-TB shape."""
    c = canonicalize_urls(df, url_col)
    winners = (c.groupBy("canonical_url")
               .agg(F.min(key).alias(key)))
    return c.join(winners, ["canonical_url", key])

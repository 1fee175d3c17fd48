"""URL canonicalization and URL-level deduplication.

Common-Crawl-style corpora carry the same page under many surface URLs
(scheme/host case, default ports, trailing slashes, fragments).  URL-level
dedup is the cheapest dedup tier — it needs no text at all — and runs
before any content hash in a production crawl cleanup.

Canonicalization rules (deterministic, documented, mirrored verbatim in
the DuckDB oracle):

1. strip the fragment (``#...``);
2. lowercase the scheme and the host[:port] authority;
3. drop an explicit default port (``:80`` for http, ``:443`` for https);
4. strip trailing slashes from the path — only when there is no query
   string (a ``/`` before ``?`` is significant);
5. URLs without a ``scheme://authority`` prefix fall back to the
   lowercased, fragment-stripped input (totality: never null).

Everything is a JVM-side regex projection — no Python, no shuffle except
the final group-by-canonical-URL hash aggregation, whose key is
md5-uniform in practice (hostnames spread) and whose aggregates are
numeric (min id, count) so Catalyst keeps HashAggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ^scheme://authority(rest-without-fragment)
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^#]*)"


def canonical_url(url_col: Column) -> Column:
    """Column expression: the canonical form of a URL column."""
    u = F.regexp_replace(url_col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    rest = F.regexp_extract(u, _URL_RE, 3)
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    rest = F.when(~rest.contains("?"),
                  F.regexp_replace(rest, "/+$", "")).otherwise(rest)
    return (F.when(host == "", F.lower(u))
            .otherwise(F.concat(scheme, F.lit("://"), host, rest)))


def canonicalize_urls(df: DataFrame, id_col: str = "doc_id",
                      url_col: str = "url") -> DataFrame:
    """(id, url, canonical_url) — the row-level canonicalization pass."""
    return df.select(F.col(id_col), F.col(url_col),
                     canonical_url(F.col(url_col)).alias("canonical_url"))


def url_dup_groups(df: DataFrame, id_col: str = "doc_id",
                   url_col: str = "url", min_pages: int = 2) -> DataFrame:
    """URL-level dedup groups: canonical URLs claimed by >= ``min_pages``
    rows, with the kept (minimum) id and the page count."""
    return (
        df.select(F.col(id_col).alias("_id"),
                  canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("_id").alias("keep_id"),
             F.count(F.lit(1)).alias("n_pages"))
        .filter(F.col("n_pages") >= min_pages)
    )

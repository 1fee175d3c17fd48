"""Hyperlink extraction and host-level link aggregation.

Common-Crawl-style corpora are a web GRAPH, not just a bag of pages:
outlink extraction feeds URL frontier seeding, PageRank-ish quality
priors, spam-cluster detection, and anchor-text mining (anchor text is a
classic relevance/label signal for the page it points to).  Two tiers:

- :func:`extract_links` — per-page (href, anchor-text) pairs pulled from
  raw HTML with one pass of JVM-side regex extraction (two aligned
  ``regexp_extract_all`` calls share the scan; no Python), plus the
  canonical target URL via :mod:`fuzzy_search_spark.pipeline.urls`.
- :func:`domain_link_graph` — the host->host edge list with link counts
  and distinct-source-page counts: one explode + one hash aggregation on
  a (src_host, dst_host) key.  Relative hrefs resolve to the source
  host, so intra-site chrome shows up as self-edges (filterable with
  ``drop_self_edges``).

The link regex is deliberately restricted to double-quoted ``href``
attributes of ``<a>`` tags with text-only anchors — the shared subset
that Java regex (Spark) and RE2 (the DuckDB oracle) tokenize
identically.  Nested-markup anchors yield their leading text run; pages
are never parsed with a DOM (the extraction tier owns DOM semantics —
extract.py; this module is the graph tier and favors one cheap scan).

Scale shape: everything is scan -> project -> explode -> hash-agg;
the only shuffle in the graph build is the edge-key aggregation, whose
(src_host, dst_host) key is near-uniform across the web.  No windows,
no Python rows, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzy_search_spark.pipeline.urls import canonical_url

#: double-quoted href + leading text run of the anchor.  Group 1 = href,
#: group 2 = anchor text (possibly empty for image/nested anchors).
LINK_RE = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)'

#: host[:port] of a scheme-qualified URL (post-canonicalization form).
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"


def host_of(url_col: Column) -> Column:
    """Column: the authority (host[:port]) of a canonical URL; empty
    string for schemeless/relative inputs."""
    return F.regexp_extract(F.lower(url_col), _HOST_RE, 1)


def extract_links(df: DataFrame, id_col: str = "doc_id",
                  html_col: str = "html") -> DataFrame:
    """Per-page outlinks: (doc_id, link_pos, href, anchor, canonical_href).

    ``link_pos`` is the 0-based occurrence order within the page, so
    downstream consumers can reconstruct first-link semantics.  The two
    ``regexp_extract_all`` projections run over the same scan row and are
    zipped positionally — one pass, no shuffle.
    """
    html = F.col(html_col)
    hrefs = F.regexp_extract_all(html, F.lit(LINK_RE), F.lit(1))
    anchors = F.regexp_extract_all(html, F.lit(LINK_RE), F.lit(2))
    pairs = F.zip_with(
        hrefs, anchors,
        lambda h, a: F.struct(h.alias("href"), a.alias("anchor")))
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(pairs).alias("link_pos", "link"))
        .select("doc_id", "link_pos",
                F.col("link.href").alias("href"),
                F.col("link.anchor").alias("anchor"))
        .withColumn("canonical_href", canonical_url(F.col("href")))
    )


def domain_link_graph(df: DataFrame, id_col: str = "doc_id",
                      url_col: str = "url", html_col: str = "html",
                      drop_self_edges: bool = False) -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links, n_src_pages).

    ``n_links`` counts href occurrences; ``n_src_pages`` counts distinct
    linking pages.  Relative hrefs (no ``scheme://authority``) resolve to
    the source page's host.
    """
    # The source host is carried through the explode instead of re-joined
    # afterwards — the edge stream never touches the corpus twice.
    src = df.select(F.col(id_col).alias("doc_id"),
                    host_of(canonical_url(F.col(url_col))).alias("src_host"),
                    F.col(html_col).alias("_html"))
    html = F.col("_html")
    hrefs = F.regexp_extract_all(html, F.lit(LINK_RE), F.lit(1))
    edges = (
        src.select("doc_id", "src_host",
                   F.explode(hrefs).alias("href"))
        .withColumn("_dst", host_of(canonical_url(F.col("href"))))
        .withColumn("dst_host",
                    F.when(F.col("_dst") == "", F.col("src_host"))
                    .otherwise(F.col("_dst")))
    )
    if drop_self_edges:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"),
             F.countDistinct("doc_id").alias("n_src_pages"))
    )


def pagerank(edges: DataFrame, src_col: str = "src_host",
             dst_col: str = "dst_host", weight_col: str = "n_links",
             damping: float = 0.85, iterations: int = 3,
             round_dp: int = 10) -> DataFrame:
    """Weighted PageRank over an aggregated edge list — the classic
    iterative-Spark workload, here as the host-quality prior a crawl
    pipeline derives from :func:`domain_link_graph` (spam clusters rank
    low, hub domains high; the standard quality feature next to the
    Gopher-style text signals).

    ``iterations`` is a FIXED count (no convergence probe): rank vectors
    stabilize to feature quality in a handful of rounds, and a fixed
    count keeps the op cross-engine reproducible — every iteration's
    ranks are rounded to ``round_dp`` decimals, so parallel float
    summation order cannot drift across cluster sizes or engines (the
    same per-iteration-rounding trick that makes the IVF trainer
    bit-reproducible; the DuckDB oracle chains one CTE per iteration).

    Dangling nodes (link targets with no outlinks — most of the web
    frontier) redistribute their mass uniformly, so total rank is
    conserved at 1.

    Scale shape per iteration: one co-keyed join of ranks against the
    edge list (both sides hash-partitioned on the source key), one
    hash aggregation onto the destination key, a broadcast one-row
    dangling-mass total, and a localCheckpoint to stop lineage growth —
    the CC loop's discipline.  Rank state is one row per node, never
    collected to the driver; the node total rides along as a broadcast
    one-row aggregate (the freq/spelling scalar-totals pattern), so the
    only driver-side jobs are the eager checkpoints themselves — no
    separate count() action.
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"),
                     F.col(weight_col).cast("double").alias("w")).persist()
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    outw = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    ranks = (nodes.crossJoin(F.broadcast(n_df))
             .select("node",
                     F.round(F.lit(1.0) / F.col("_n"), round_dp)
                     .alias("rank")))
    for _ in range(iterations):
        contribs = (
            e.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .join(outw, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("w_out"))
                 .alias("_in"))
        )
        dangling = (
            ranks.join(outw.select(F.col("src").alias("node")),
                       "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_df))
            .select("node", F.round(
                (F.lit(1.0) - F.lit(damping)) / F.col("_n")
                + F.lit(damping)
                * (F.coalesce(F.col("_in"), F.lit(0.0))
                   + F.col("_dm") / F.col("_n")),
                round_dp).alias("rank"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks


def anchor_text_index(df: DataFrame, id_col: str = "doc_id",
                      html_col: str = "html") -> DataFrame:
    """Anchor-text aggregation per link target: what the web CALLS a
    page — the classic off-page relevance/label signal (anchor text
    describes the target better than the target's own boilerplate).

    Returns per canonical target URL:
    ``(canonical_href, n_mentions, n_anchors, top_anchor, top_count)``
    where ``top_anchor`` is the most frequent non-empty anchor string
    (ties -> lexicographically smallest).

    Scale shape: the link explode feeds a single aggregation CHAIN —
    (target, anchor) counts with map-side partials, then a per-target
    rollup whose argmax is ``min_by`` over the UNIQUE lexicographic key
    ``(-count, anchor)`` (unique => deterministic despite min_by's
    any-of-ties contract) in a constant-size buffer.  Spark plans
    struct-keyed min_by sort-based, but the sort runs AFTER the count
    HashAggregate has reduced the stream to distinct (target, anchor)
    pairs, and partial aggregation sends ONE row per target per task
    into the shuffle — strictly less work than the window alternative,
    which also sorts but carries every row (a hub URL can be linked
    millions of times).  One lineage, no diamond.
    """
    links = extract_links(df, id_col=id_col, html_col=html_col)
    counts = (
        links.filter(F.length("anchor") > 0)
        .groupBy("canonical_href", "anchor")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("canonical_href")
        .agg(F.sum("c").alias("n_mentions"),
             F.count(F.lit(1)).alias("n_anchors"),
             F.min_by(
                 F.struct(F.col("anchor").alias("a"),
                          F.col("c").alias("c")),
                 F.struct((-F.col("c")).alias("nc"),
                          F.col("anchor").alias("a"))).alias("_b"))
        .select("canonical_href", "n_mentions", "n_anchors",
                F.col("_b.a").alias("top_anchor"),
                F.col("_b.c").cast("long").alias("top_count"))
    )


#: meta-robots content, both attribute orders (name-first / content-first)
_ROBOTS_NF = r'<meta [^>]*name="robots"[^>]*content="([^"]*)"'
_ROBOTS_CF = r'<meta [^>]*content="([^"]*)"[^>]*name="robots"'
#: rel=canonical href, both attribute orders
_CANON_RF = r'<link [^>]*rel="canonical"[^>]*href="([^"]*)"'
_CANON_HF = r'<link [^>]*href="([^"]*)"[^>]*rel="canonical"'


def crawl_directives(df: DataFrame, id_col: str = "doc_id",
                     url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """Per-page crawl/indexing directives pulled from raw HTML:
    ``(doc_id, noindex, nofollow, rel_canonical, effective_canonical)``.

    - ``noindex`` / ``nofollow`` come from the ``<meta name="robots">``
      content (either attribute order) — the standard pre-index drop
      gate (a page that asks not to be indexed should not be trained on
      either, and noindex pages are disproportionately thin/utility
      pages).
    - ``rel_canonical`` is the page's DECLARED canonical URL (``<link
      rel="canonical">``), empty when absent.
    - ``effective_canonical`` canonicalizes the declared URL when
      present, else the fetch URL — the strongest URL-level dedup key
      available without content hashing (the site itself asserts which
      page this is a copy of); feed it straight into a
      group-by-canonical dedup exactly like
      :func:`fuzzy_search_spark.pipeline.urls.url_dup_groups`.

    Pure JVM regex projections over one scan — no shuffle, no Python;
    fuses into any downstream plan.
    """
    html = F.col(html_col)
    robots = F.lower(F.coalesce(
        F.nullif(F.regexp_extract(html, _ROBOTS_NF, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _ROBOTS_CF, 1), F.lit("")),
        F.lit("")))
    rel = F.coalesce(
        F.nullif(F.regexp_extract(html, _CANON_RF, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _CANON_HF, 1), F.lit("")),
        F.lit(""))
    effective = F.when(rel != "", canonical_url(rel)) \
        .otherwise(canonical_url(F.col(url_col)))
    return df.select(
        F.col(id_col),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        rel.alias("rel_canonical"),
        effective.alias("effective_canonical"))


def parse_sitemaps(df: DataFrame, host_col: str = "host",
                   xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap.xml extraction — the crawl-frontier companion to
    robots.txt: one row per ``<url>`` entry (kind ``url``) or per nested
    ``<sitemap>`` reference in an index file (kind ``sitemap``), with
    ``loc`` and the optional ``lastmod`` string.

    Pure JVM column algebra: ``(?s)`` non-greedy block extraction (an
    alternation of the two literal tag pairs — no backreference, so the
    pattern stays portable to RE2-dialect engines) + per-block field
    regexes, one posexplode — no shuffle beyond the explode itself,
    state bounded by a single sitemap file exactly like
    :func:`fuzzy_search_spark.pipeline.robots.parse_robots`."""
    blocks = F.regexp_extract_all(
        F.col(xml_col),
        F.lit(r"(?s)<url>.*?</url>|<sitemap>.*?</sitemap>"), F.lit(0))
    exploded = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(blocks).alias("pos", "block"))
    kind = F.regexp_extract(F.col("block"), r"^<(url|sitemap)>", 1)
    loc = F.regexp_extract(F.col("block"),
                           r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(F.col("block"),
                               r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    return (exploded.select(
        "host", "pos", kind.alias("kind"), loc.alias("loc"),
        F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"))
        .filter(F.col("loc") != ""))

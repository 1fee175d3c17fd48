"""Unit tests for hyperlink extraction + host-level link aggregation
(pipeline/weblinks.py) and the paragraph-dedup transformation
(textstats.strip_duplicate_paragraphs)."""

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    import os

    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = get_spark(master="local[4]", app_name="weblinks-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame([
        (1, "http://a.com/x",
         '<html><a href="HTTP://B.com:80/p/">go B</a> text '
         '<a class="z" href="/rel">rel</a>'
         '<a href="https://c.org/q#f">C <b>bold</b></a></html>'),
        (2, "https://b.com/y", "<p>no links</p>"),
        (3, "https://a.com/z", '<a href="http://b.com/p">again</a>'),
    ], "doc_id long, url string, html string")


def test_extract_links_crafted(pages):
    from fuzzy_search_spark.pipeline.weblinks import extract_links

    rows = extract_links(pages).orderBy("doc_id", "link_pos").collect()
    got = [(r.doc_id, r.link_pos, r.href, r.anchor, r.canonical_href)
           for r in rows]
    assert got == [
        (1, 0, "HTTP://B.com:80/p/", "go B", "http://b.com/p"),
        (1, 1, "/rel", "rel", "/rel"),
        # text-run anchor stops at nested markup; fragment stripped
        (1, 2, "https://c.org/q#f", "C ", "https://c.org/q"),
        (3, 0, "http://b.com/p", "again", "http://b.com/p"),
    ]


def test_domain_link_graph_crafted(pages):
    from fuzzy_search_spark.pipeline.weblinks import domain_link_graph

    rows = domain_link_graph(pages).orderBy("src_host", "dst_host").collect()
    got = {(r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
           for r in rows}
    # relative /rel resolves to the source host a.com (self-edge)
    assert got == {
        ("a.com", "a.com"): (1, 1),
        ("a.com", "b.com"): (2, 2),
        ("a.com", "c.org"): (1, 1),
    }
    noself = domain_link_graph(pages, drop_self_edges=True).collect()
    assert {(r.src_host, r.dst_host) for r in noself} == \
        {("a.com", "b.com"), ("a.com", "c.org")}


def test_link_ops_plan_shape(pages):
    """extract_links is scan -> project -> explode (no shuffle, no
    Python); the link graph's only exchange is the edge-key hash-agg."""
    from fuzzy_search_spark.pipeline.weblinks import (domain_link_graph,
                                                     extract_links)

    lp = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in lp and "Python" not in lp

    gp = (domain_link_graph(pages)
          ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in gp and "SortAggregate" not in gp


def test_strip_duplicate_paragraphs_crafted(spark):
    from fuzzy_search_spark.pipeline.textstats import (
        strip_duplicate_paragraphs,
    )

    docs = spark.createDataFrame([
        (1, "unique one\n\nshared banner\n\ntail a"),
        (2, "unique two\n\nshared banner\n\ntail a"),
        (3, "all alone here\n\n\n\nanother solo"),   # empty para dropped
        (4, "shared banner"),                          # fully boilerplate
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in strip_duplicate_paragraphs(docs).collect()}
    assert len(out) == 4
    assert (out[1].n_paras, out[1].n_kept) == (3, 1)
    assert out[1].clean_text == "unique one"
    assert out[2].clean_text == "unique two"
    # doc 3: both paragraphs unique, empty middle removed, order kept
    assert (out[3].n_paras, out[3].n_kept) == (2, 2)
    assert out[3].clean_text == "all alone here\n\nanother solo"
    # doc 4: its single paragraph is shared -> empty text, still present
    assert (out[4].n_paras, out[4].n_kept) == (1, 0)
    assert out[4].clean_text == ""


def test_strip_duplicate_paragraphs_line_mode(spark):
    """sep='\\n' gives RefinedWeb-style line-level dedup."""
    from fuzzy_search_spark.pipeline.textstats import (
        strip_duplicate_paragraphs,
    )

    docs = spark.createDataFrame([
        (1, "keep me\nnav | home | about\nreal content 1"),
        (2, "nav | home | about\nreal content 2"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in
           strip_duplicate_paragraphs(docs, sep="\n").collect()}
    assert out[1].clean_text == "keep me\nreal content 1"
    assert out[2].clean_text == "real content 2"


def test_strip_duplicate_paragraphs_plan_shape(spark):
    """The paragraph relation explodes ONCE: the dup-set aggregation and
    the keep join share the repartition(phash) exchange at runtime (AQE
    reuse); aggregation stays HashAggregate."""
    from fuzzy_search_spark.pipeline.textstats import (
        strip_duplicate_paragraphs,
    )

    docs = spark.createDataFrame(
        [(i, f"unique lead {i}\n\nshared boilerplate\n\ntail {i % 3}")
         for i in range(30)],
        "doc_id long, text string")
    out = strip_duplicate_paragraphs(docs)
    out.collect()
    final = (out._jdf.queryExecution().executedPlan().toString()
             .split("== Initial")[0])
    assert "isFinalPlan=true" in final
    assert final.count("Reused") >= 1, "paragraph subtree not stage-reused"
    assert final.count("Generate posexplode") == 1
    assert "SortAggregate" not in final


def test_pagerank_matches_python_and_conserves_mass(spark):
    """3-iteration weighted PageRank == a pure-Python power iteration
    with identical per-iteration rounding; total rank mass stays 1
    (dangling nodes redistribute instead of leaking)."""
    from fuzzy_search_spark.pipeline.weblinks import pagerank

    edges = [
        ("a.com", "b.com", 3), ("a.com", "c.com", 1),
        ("b.com", "a.com", 1), ("b.com", "d.com", 1),
        ("c.com", "a.com", 2),
        # d.com is dangling (no outlinks)
    ]
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long")
    got = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    rank = {v: round(1.0 / n, 10) for v in nodes}
    for _ in range(3):
        dm = sum(rank[v] for v in nodes if v not in outw)
        incoming = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            incoming[d] += rank[s] * w / outw[s]
        rank = {v: round((1 - 0.85) / n
                         + 0.85 * (incoming[v] + dm / n), 10)
                for v in nodes}

    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-10), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # link-weighted asymmetry: a.com gets 2x the c.com->a mass plus
    # b.com's half; b.com gets 3/4 of a.com's mass -> both outrank c/d
    assert got["a.com"] > got["c.com"] and got["b.com"] > got["d.com"]


def test_pagerank_no_driver_count_action(spark, monkeypatch):
    """The node total rides in the DAG as a broadcast one-row aggregate:
    pagerank() construction never calls the count() driver action (the
    eager localCheckpoints are the only jobs it is allowed to run)."""
    from pyspark.sql import DataFrame

    from fuzzy_search_spark.pipeline.weblinks import pagerank

    df = spark.createDataFrame(
        [("a.com", "b.com", 1), ("b.com", "c.com", 2)],
        "src_host string, dst_host string, n_links long")

    def boom(self):
        raise AssertionError("count() called during pagerank construction")

    monkeypatch.setattr(DataFrame, "count", boom)
    ranks = pagerank(df, iterations=3)
    monkeypatch.undo()
    total = sum(r.rank for r in ranks.collect())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_anchor_text_index_crafted(spark):
    from fuzzy_search_spark.pipeline.weblinks import anchor_text_index

    mk = '<a href="{}">{}</a>'
    pages = spark.createDataFrame([
        (1, mk.format("http://t.com/p", "click here")
            + mk.format("http://T.com:80/p", "target page")
            + mk.format("http://t.com/p#x", "target page")),
        (2, mk.format("http://t.com/p/", "target page")
            + mk.format("http://other.org/q", "elsewhere")
            + '<a href="http://t.com/p"><img/></a>'),   # empty anchor
    ], "doc_id long, html string")
    out = {r.canonical_href: r for r in anchor_text_index(pages).collect()}
    # all five t.com variants canonicalize together; empty anchor excluded
    t = out["http://t.com/p"]
    assert (t.n_mentions, t.n_anchors) == (4, 2)
    assert (t.top_anchor, t.top_count) == ("target page", 3)
    assert out["http://other.org/q"].top_anchor == "elsewhere"

    plan = (anchor_text_index(pages)
            ._jdf.queryExecution().executedPlan().toString())
    # the heavy (target, anchor) count is a HashAggregate; the argmax
    # rollup is the (sort-based) struct min_by over the REDUCED pair
    # stream — never a window, never a Python pass
    assert "HashAggregate" in plan
    assert "Window" not in plan and "Python" not in plan
    assert plan.count("SortAggregate") <= 2


def test_crawl_directives_crafted(spark):
    from fuzzy_search_spark.pipeline.weblinks import crawl_directives

    pages = spark.createDataFrame([
        (1, "http://a.com/x",
         '<head><meta name="robots" content="noindex, nofollow">'
         '<link rel="canonical" href="HTTP://A.com:80/X/"></head>'),
        (2, "http://b.com/y",
         '<head><meta content="NOINDEX" name="robots">'
         '<link href="/self" rel="canonical"></head>'),
        (3, "HTTP://C.com:80/z#frag", "<head></head>"),
    ], "doc_id long, url string, html string")
    out = {r.doc_id: r for r in crawl_directives(pages).collect()}
    assert out[1].noindex and out[1].nofollow
    assert out[1].rel_canonical == "HTTP://A.com:80/X/"
    assert out[1].effective_canonical == "http://a.com/X"
    # content-first attribute order + uppercase still detected
    assert out[2].noindex and not out[2].nofollow
    assert out[2].effective_canonical == "/self"
    # no directives: flags false, canonical falls back to the fetch URL
    assert not out[3].noindex and out[3].rel_canonical == ""
    assert out[3].effective_canonical == "http://c.com/z"

    plan = (crawl_directives(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_parse_sitemaps(spark):
    """Sitemap url entries + index references extract with optional
    lastmod; entries without <loc> are dropped; multiline XML handled."""
    from fuzzy_search_spark.pipeline.weblinks import parse_sitemaps

    urlset = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url><loc> https://h/a </loc>"
        "<lastmod>2024-01-02</lastmod></url>\n"
        "  <url><loc>https://h/b</loc></url>\n"
        "  <url><lastmod>2024-05-05</lastmod></url>\n"
        "</urlset>")
    index = (
        "<sitemapindex>\n"
        "<sitemap><loc>https://h/s1.xml</loc>"
        "<lastmod>2023-12-31</lastmod></sitemap>\n"
        "<sitemap><loc>https://h/s2.xml</loc></sitemap>\n"
        "</sitemapindex>")
    df = spark.createDataFrame([("h1", urlset), ("h2", index)],
                               "host string, sitemap_xml string")
    rows = sorted((r.host, r.kind, r.loc, r.lastmod)
                  for r in parse_sitemaps(df).collect())
    assert rows == [
        ("h1", "url", "https://h/a", "2024-01-02"),
        ("h1", "url", "https://h/b", None),
        ("h2", "sitemap", "https://h/s1.xml", "2023-12-31"),
        ("h2", "sitemap", "https://h/s2.xml", None),
    ]

    plan = parse_sitemaps(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan


def test_blocklist_admission_suffix_semantics(spark):
    """Domain-suffix blocking: exact host, deep subdomain, and the dot
    boundary (a host merely ENDING in the domain string stays allowed)."""
    from fuzzy_search_spark.pipeline.urls import blocklist_admission

    rows = [(0, "https://bad.com/x"),
            (1, "https://a.b.bad.com/y"),
            (2, "https://notbad.com/z"),          # no dot boundary
            (3, "http://good.org/"),
            (4, "https://sub.tracker.net:8080/p")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in
           blocklist_admission(df, ["bad.com", "tracker.net"]).collect()}
    assert not got[0].allowed and got[0].matched_domain == "bad.com"
    assert not got[1].allowed and got[1].host == "a.b.bad.com"
    assert got[2].allowed and got[2].matched_domain is None
    assert got[3].allowed
    assert not got[4].allowed and got[4].matched_domain == "tracker.net"

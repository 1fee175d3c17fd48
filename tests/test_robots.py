"""robots.txt interpretation (pipeline/robots.py): RFC 9309 grouping,
wildcard/$ patterns, longest-match + allow-wins-ties precedence, and the
specific-group-shadows-star rule."""

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    import os

    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = get_spark(master="local[4]", app_name="robots-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


ROBOTS = """# synthetic robots with comments
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: fuzzybot
User-agent: otherbot
Disallow: /q/*7$
Disallow:
Allow: /q/open
"""


@pytest.fixture(scope="module")
def rules(spark):
    from fuzzy_search_spark.pipeline.robots import parse_robots

    hosts = spark.createDataFrame(
        [("h1.com", ROBOTS),
         ("h2.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    return parse_robots(hosts).cache()


def test_parse_groups_and_patterns(rules):
    got = sorted((r.host, r.agent, r.rule, r.path, r.pattern, r.path_len)
                 for r in rules.collect())
    assert got == [
        # multi-agent group: each agent gets each rule; empty Disallow
        # dropped; $ anchor -> no trailing %, * -> %
        ("h1.com", "*", "allow", "/private/ok", "/private/ok%", 11),
        ("h1.com", "*", "disallow", "/private", "/private%", 8),
        ("h1.com", "fuzzybot", "allow", "/q/open", "/q/open%", 7),
        ("h1.com", "fuzzybot", "disallow", "/q/*7$", "/q/%7", 6),
        ("h1.com", "otherbot", "allow", "/q/open", "/q/open%", 7),
        ("h1.com", "otherbot", "disallow", "/q/*7$", "/q/%7", 6),
        ("h2.com", "*", "disallow", "/", "/%", 1),
    ]


URLS = [
    "https://h1.com/private/x", "https://h1.com/private/ok/y",
    "https://h1.com/pub", "https://h1.com/q/a7", "https://h1.com/q/a78",
    "https://h1.com/q/open7", "https://h2.com/anything",
    "https://h2.com", "https://nohost.com/z",
]


def _decide(spark, rules, agent):
    from fuzzy_search_spark.pipeline.robots import robots_allowed

    urls = spark.createDataFrame([(u,) for u in URLS], "url string")
    return {r.url: (r.allowed, r.matched_rule, r.matched_path)
            for r in robots_allowed(urls, rules, agent).collect()}


def test_star_agent_decisions(spark, rules):
    d = _decide(spark, rules, "*")
    assert len(d) == len(URLS)
    # longest match wins: allow /private/ok beats disallow /private
    assert d["https://h1.com/private/ok/y"] == (True, "allow",
                                                "/private/ok")
    assert d["https://h1.com/private/x"] == (False, "disallow", "/private")
    # no rule matched -> allowed; fuzzybot group invisible to *
    assert d["https://h1.com/q/a7"] == (True, None, None)
    assert d["https://h1.com/pub"] == (True, None, None)
    # empty path normalizes to "/" and matches Disallow: /
    assert d["https://h2.com"][0] is False
    assert d["https://h2.com/anything"][0] is False
    # host without robots.txt -> allowed
    assert d["https://nohost.com/z"] == (True, None, None)


def test_specific_agent_shadows_star(spark, rules):
    d = _decide(spark, rules, "FuzzyBot")     # case-insensitive token
    # the * group is IGNORED where a specific group exists (RFC 2.2.1)
    assert d["https://h1.com/private/x"] == (True, None, None)
    # $ anchors: /q/*7$ blocks ...7 but not ...78
    assert d["https://h1.com/q/a7"] == (False, "disallow", "/q/*7$")
    assert d["https://h1.com/q/a78"] == (True, None, None)
    # allow /q/open (len 7) beats /q/*7$ (len 6) on /q/open7
    assert d["https://h1.com/q/open7"] == (True, "allow", "/q/open")
    # host with only a * group still applies to the specific agent
    assert d["https://h2.com/anything"][0] is False

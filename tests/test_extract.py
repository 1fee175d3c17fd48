"""Direct tests for the deterministic HTML extractor (the north rule's
first stage): edge cases, byte handling, and the fixed-point invariant the
fixture generator relies on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from fuzzy_search_spark.extract import extract_html, normalize_text
from fuzzy_search_spark.fixtures import web_pages_pandas


def test_basic_boilerplate_strip():
    html = b"""<html><head><title>T</title><script>var x = '<p>';</script>
    <style>p { color: red }</style></head>
    <body><nav>menu</nav><p>Hello &amp; goodbye</p>
    <div>line two</div><footer>foot</footer></body></html>"""
    assert extract_html(html) == "Hello & goodbye\nline two"


def test_comments_cdata_and_entities():
    html = (b"<body><!-- a <p>commented</p> tag -->"
            b"<![CDATA[ <raw> ]]>"
            b"<p>&#39;quoted&#39; &lt;tag&gt; &euro;100</p></body>")
    assert extract_html(html) == "'quoted' <tag> €100"


def test_block_tags_become_newlines_inline_vanish():
    html = b"<h1>Title</h1><p>a <b>bold</b> word</p><ul><li>x</li><li>y</li></ul>"
    assert extract_html(html) == "Title\na bold word\nx\ny"


def test_invalid_utf8_is_deterministic():
    payload = b"<p>caf\xe9 bad\xff\xfebytes</p>"
    out1 = extract_html(payload)
    out2 = extract_html(bytes(payload))
    assert out1 == out2
    assert "caf" in out1 and "�" in out1  # replacement char, not a crash


def test_none_and_empty():
    assert extract_html(None) == ""
    assert extract_html(b"") == ""
    assert extract_html("") == ""
    assert extract_html(b"<script>only</script>") == ""


def test_nested_and_case_insensitive_drop():
    html = b"<SCRIPT type='x'>a</SCRIPT><P>keep</P><NoScript>b</NoScript>"
    assert extract_html(html) == "keep"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab <>&;\n\tp/", max_size=80))
def test_normalize_is_idempotent(raw):
    once = normalize_text(raw)
    assert normalize_text(once) == once


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abcd .,!\n", max_size=80))
def test_extracted_text_is_fixed_point(plain):
    """Tag-free normalized text passes through extraction unchanged —
    the invariant that lets the text column be recomputed from html."""
    norm = normalize_text(plain)
    assert extract_html(norm) == norm


def test_fixture_rows_satisfy_extraction_invariant():
    df = web_pages_pandas(n_bulk=40)
    assert len(df) >= 40
    for _, row in df.iterrows():
        assert extract_html(row["html"]) == row["text"], row["url"]

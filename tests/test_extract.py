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


class TestMainContent:
    PAGE = b"""<html><head><title>t</title></head><body>
    <nav><a href="/">Home</a> <a href="/x">Products</a> <a href="/y">About</a></nav>
    <div class="menu"><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a> <a href="/4">four</a> <a href="/5">five</a></div>
    <article>
      <p>This is the first real paragraph of the article body with enough prose to pass the length gate.</p>
      <p>A second substantial paragraph continues the main content and also clears forty characters easily.</p>
      <p>Read more in <a href="/ref">our reference</a> section, a low link-density sentence overall.</p>
    </article>
    <footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
    </body></html>"""

    def test_keeps_prose_drops_chrome(self):
        from fuzzy_search_spark.extract import extract_main_content

        out = extract_main_content(self.PAGE)
        assert "first real paragraph" in out
        assert "second substantial paragraph" in out
        assert "our reference" in out       # low-density inline link kept
        assert "Products" not in out        # nav dropped (drop tag)
        assert "three" not in out           # link-dense menu dropped
        assert "Privacy" not in out         # footer dropped

    def test_deterministic_and_strip_mode_superset(self):
        from fuzzy_search_spark.extract import (
            extract_html,
            extract_main_content,
        )

        a = extract_main_content(self.PAGE)
        assert a == extract_main_content(self.PAGE)
        full = extract_html(self.PAGE)
        for line in a.split("\n"):
            assert line in full  # main mode only removes, never invents


class TestPdf:
    @staticmethod
    def _make_pdf(content: bytes, compress: bool) -> bytes:
        import zlib

        body = zlib.compress(content) if compress else content
        flt = b"/Filter /FlateDecode " if compress else b""
        return (b"%PDF-1.4\n1 0 obj\n<< " + flt +
                b"/Length " + str(len(body)).encode() + b" >>\n" +
                b"stream\n" + body + b"endstream\nendobj\n%%EOF\n")

    def test_flate_stream_tj(self):
        from fuzzy_search_spark.extract import extract_pdf

        content = b"BT /F1 12 Tf (Hello PDF world) Tj ET"
        assert extract_pdf(self._make_pdf(content, True)) == "Hello PDF world"
        assert extract_pdf(self._make_pdf(content, False)) == "Hello PDF world"

    def test_tj_array_escapes_and_lines(self):
        from fuzzy_search_spark.extract import extract_pdf

        content = (rb"BT [(Wor) -120 (ld \(escaped\))] TJ "
                   rb"0 -14 Td (line \164wo) Tj ET")
        out = extract_pdf(self._make_pdf(content, True))
        assert out == "World (escaped)\nline two"

    def test_payload_dispatch(self):
        from fuzzy_search_spark.extract import extract_payload

        pdf = self._make_pdf(b"BT (from pdf) Tj ET", True)
        assert extract_payload(pdf) == "from pdf"
        assert extract_payload(b"<html><p>from html</p></html>") == "from html"
        assert extract_payload(b"plain   text\n\n here") == "plain text\nhere"
        assert extract_payload(TestMainContent.PAGE, mode="main").startswith(
            "This is the first real paragraph")


def test_extractors_never_raise_on_garbage():
    """Extraction is total: random bytes (including truncated PDF/HTML
    magic) produce a string, never an exception."""
    import random

    from fuzzy_search_spark.extract import (
        extract_html,
        extract_main_content,
        extract_payload,
        extract_pdf,
    )

    rng = random.Random(21)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
             for _ in range(200)]
    blobs += [b"%PDF-" + blobs[i][:50] for i in range(20)]
    blobs += [b"<html><div>" + blobs[i][:50] for i in range(20)]
    blobs += [b"stream\n\x78\x9c\x00garbage endstream", b"", None]
    for blob in blobs:
        for fn in (extract_html, extract_main_content, extract_pdf,
                   extract_payload):
            assert isinstance(fn(blob), str)

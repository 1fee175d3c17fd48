"""WARC source: stdlib writer/parser round-trip, charset sniffing, and the
distributed (synth -> parse) Spark path.

The reference library has no crawl-ingestion layer; the contract here is
the WARC/1.0 spec (ISO 28500) + the north rule's Common-Crawl-style input
table (url, warc_ts, html, ...)."""

from datetime import datetime, timedelta

import pytest

from fuzzy_search_spark.sources.warc import (
    WarcRecord,
    build_warc,
    build_warc_record,
    decode_payload,
    iter_warc,
    read_warc,
    sniff_charset,
    synth_warc_files,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    from fuzzy_search_spark.spark.session import get_spark

    spark = get_spark(master="local[4]", app_name="warc-source-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def _resp(url, sec, payload, **kw):
    return build_warc_record("response", url, datetime(2020, 1, 1)
                             + timedelta(seconds=sec), payload, **kw)


def test_roundtrip_plain_and_gzip():
    r = _resp("https://a/1", 5, b"<html>hi</html>")
    info = build_warc_record("warcinfo", "urn:x", datetime(2020, 1, 1),
                             b"robots: classic",
                             http_content_type="application/warc-fields")
    for gz in (False, True):
        recs = list(iter_warc(build_warc([info, r], gzip_members=gz)))
        assert [x.record_type for x in recs] == ["warcinfo", "response"]
        resp = recs[1]
        assert resp.url == "https://a/1"
        assert resp.date == datetime(2020, 1, 1, 0, 0, 5)
        assert resp.http_status == 200
        assert resp.http_content_type == "text/html; charset=utf-8"
        assert resp.payload == b"<html>hi</html>"
        assert recs[0].payload == b"robots: classic"


def test_writer_deterministic():
    r = _resp("https://a/1", 0, b"x" * 100)
    assert build_warc([r]) == build_warc([r])
    assert build_warc([r], gzip_members=False) == \
        build_warc([r], gzip_members=False)


def test_malformed_record_resync():
    """A record with a corrupt Content-Length must not take down the file:
    the parser resyncs on the next WARC/1. magic."""
    good1 = _resp("https://a/1", 0, b"one")
    bad = _resp("https://a/2", 1, b"two").replace(
        b"Content-Length:", b"Content-Lenxth:", 1)
    good2 = _resp("https://a/3", 2, b"three")
    recs = list(iter_warc(build_warc([good1, bad, good2],
                                     gzip_members=False)))
    assert [x.url for x in recs if x.payload in (b"one", b"three")] == \
        ["https://a/1", "https://a/3"]


def test_truncated_gzip_tail_keeps_prior_members():
    data = build_warc([_resp("https://a/%d" % i, i, b"p%d" % i)
                       for i in range(4)], gzip_members=True)
    # chop into the final member's deflate stream
    recs = list(iter_warc(data[:len(data) - 15]))
    assert len(recs) >= 3 and recs[0].payload == b"p0"


def test_charset_priority_bom_header_meta():
    assert sniff_charset(b"\xef\xbb\xbfabc") == "utf-8-sig"
    assert sniff_charset("x".encode("utf-16")) == "utf-16"
    # HTTP header beats meta
    assert sniff_charset(b'<meta charset="windows-1252">',
                         "text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert sniff_charset(b'<html><meta charset="windows-1252">') == \
        "windows-1252"
    # unknown label falls back
    assert sniff_charset(b"zz", "text/html; charset=not-a-codec") == "utf-8"
    assert decode_payload("caf\xe9".encode("latin-1"),
                          "text/html; charset=iso-8859-1") == "caf\xe9"
    assert decode_payload("caf\xe9".encode("utf-16")) == "caf\xe9"
    # invalid bytes never raise
    assert "�" in decode_payload(b"\xff\xfe\xff\xff\xff")


def test_extract_html_roundtrip_through_warc():
    """write -> gzip -> parse -> decode -> extract reproduces the text."""
    from fuzzy_search_spark.extract import extract_html

    text = "A & B < C laws of 1725"
    esc = text.replace("&", "&amp;").replace("<", "&lt;")
    html = ("<html><body><p>%s</p></body></html>" % esc).encode()
    rec = list(iter_warc(build_warc([_resp("https://a/1", 0, html)])))[0]
    assert extract_html(decode_payload(rec.payload,
                                       rec.http_content_type)) == text


def test_spark_synth_and_read_warc(spark):
    """Distributed path: documents -> WARC files -> parsed page rows."""
    docs = spark.createDataFrame(
        [(i, f"doc {i} body & more") for i in range(20)],
        "doc_id long, text string")
    files = synth_warc_files(docs, n_files=4)
    fl = files.collect()
    assert len(fl) == 4
    assert all(r.path.endswith(".warc.gz") for r in fl)

    pages = read_warc(files)
    rows = {r.url: r for r in pages.collect()}
    assert len(rows) == 20
    r7 = rows["https://example.org/7"]
    assert r7.http_status == 200
    assert bytes(r7.html) == \
        b"<html><body><p>doc 7 body &amp; more</p></body></html>"
    assert r7.warc_ts == datetime(2020, 1, 1, 0, 0, 7)

    # non-response records are dropped by the reader
    extra = build_warc([build_warc_record(
        "warcinfo", "urn:x", datetime(2020, 1, 1), b"fields",
        http_content_type="application/warc-fields")])
    one = spark.createDataFrame([("f.warc.gz", bytearray(extra))],
                                "path string, content binary")
    assert read_warc(one).count() == 0

    # plan shape: the parse itself is shuffle-free (one Exchange total,
    # from the fixture's groupBy; a real binaryFile scan has zero)
    plan = pages._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1


def test_streaming_warc_ingest_equals_batch(spark, tmp_path):
    """availableNow readStream(binaryFile) -> read_warc emits exactly the
    batch rows: the WARC scan is a stateless mapInPandas, so the streaming
    plan IS the batch plan under incremental file discovery."""
    from datetime import datetime, timedelta

    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    expect = {}
    for f in range(3):
        recs = []
        for i in range(5):
            doc = f * 5 + i
            payload = b"<html><body><p>doc %d</p></body></html>" % doc
            url = f"https://example.org/{doc}"
            recs.append(_resp(url, doc, payload))
            expect[url] = payload
        (warc_dir / f"part-{f}.warc.gz").write_bytes(build_warc(recs))

    stream = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary")
              .load(str(warc_dir)))
    q = (read_warc(stream)
         .writeStream.format("memory").queryName("warc_pages")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT url, warc_ts, html FROM warc_pages").collect()
    assert len(rows) == 15
    for r in rows:
        assert bytes(r.html) == expect[r.url]
        doc = int(r.url.rsplit("/", 1)[1])
        assert r.warc_ts == datetime(2020, 1, 1) + timedelta(seconds=doc)

    # batch read over the same directory byte-equals the streamed rows
    batch = (spark.read.format("binaryFile").load(str(warc_dir)))
    brows = read_warc(batch).select("url", "html").collect()
    assert {r.url: bytes(r.html) for r in brows} == expect


def test_extraction_job_over_warc_equals_parquet(spark, tmp_path):
    """run_extraction_job(table_format='warc') over real WARC archives
    produces exactly the matches of the parquet web-pages path: the
    fixture guarantees extract_html(html) == text, and the WARC branch
    feeds NULL text so extraction happens in the match pass."""
    from fuzzy_search_spark.fixtures import (README_CONFIG, README_MODEL,
                                             write_web_pages_parquet)
    from fuzzy_search_spark.model import compile_model
    from fuzzy_search_spark.spark.job import run_extraction_job

    pages_path = str(tmp_path / "web_pages.parquet")
    write_web_pages_parquet(pages_path, n_bulk=40, tail_docs_per_1k=0)
    pages = spark.read.parquet(pages_path).collect()

    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    for f in range(3):
        recs = [build_warc_record("response", r.url, r.warc_ts,
                                  bytes(r.html))
                for i, r in enumerate(pages) if i % 3 == f]
        (warc_dir / f"crawl-{f}.warc.gz").write_bytes(build_warc(recs))

    model = compile_model(README_MODEL, README_CONFIG)
    out_w = str(tmp_path / "out_warc")
    out_p = str(tmp_path / "out_parquet")
    s_w = run_extraction_job(spark, str(warc_dir), out_w, model,
                             num_groups=2, table_format="warc")
    s_p = run_extraction_job(spark, pages_path, out_p, model, num_groups=2)
    assert s_w["docs"] == s_p["docs"] > 0
    assert s_w["matches"] == s_p["matches"] > 0

    got_w = sorted(map(str, spark.read.parquet(
        f"{out_w}/matches/group=*").collect()))
    got_p = sorted(map(str, spark.read.parquet(
        f"{out_p}/matches/group=*").collect()))
    assert got_w == got_p


def test_wet_write_read_roundtrip(spark):
    """WET sink/source: extracted text serializes to WARC conversion
    records and parses back identically; file assignment is md5-balanced
    and bytes are deterministic."""
    from fuzzy_search_spark.sources.warc import read_wet, write_wet

    pages = spark.createDataFrame(
        [(f"https://h/{i}", datetime(2021, 3, 1, 0, 0, i),
          f"text {i} body\nline two" if i % 5 else "")
         for i in range(25)],
        "url string, warc_ts timestamp, text string")
    files1 = {r.path: bytes(r.content) for r in
              write_wet(pages, n_files=4).collect()}
    files2 = {r.path: bytes(r.content) for r in
              write_wet(pages, n_files=4).collect()}
    assert files1 == files2                       # deterministic bytes
    assert len(files1) == 4
    assert all(p.endswith(".warc.wet.gz") for p in files1)

    back = read_wet(write_wet(pages, n_files=4))
    rows = {r.url: r for r in back.collect()}
    assert len(rows) == 25
    for i in range(25):
        r = rows[f"https://h/{i}"]
        assert r.text == (f"text {i} body\nline two" if i % 5 else "")
        assert r.warc_ts == datetime(2021, 3, 1, 0, 0, i)

    # records are WARC 'conversion' type, readable by the generic parser
    rec = next(iter_warc(next(iter(files1.values()))))
    assert rec.record_type == "conversion"
    assert rec.content_type == "text/plain"

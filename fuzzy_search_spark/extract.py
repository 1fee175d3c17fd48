"""Deterministic HTML -> main-text extraction (boilerplate strip).

The north rule requires a from-scratch main-content extraction stage over
Common-Crawl-style pages with *byte-identical extracted text per url*.  The
reference library has no HTML layer (it consumes already-extracted text), so
this extractor defines the contract: it is a pure function of the html bytes
— no randomness, no wall-clock, no environment — and the fixture generator
guarantees ``extract_html(html) == text`` for every generated row.

Algorithm (single pass of compiled regexes + one normalization pass):

1. decode UTF-8 (errors="replace")
2. drop comments and CDATA
3. drop entire boilerplate/invisible elements: script, style, noscript,
   template, svg, head, nav, footer, aside, form, iframe, button
4. block-level tags and <br> become newlines, all other tags vanish
5. decode HTML entities (stdlib html.unescape)
6. whitespace normalization: collapse runs of blanks inside lines, strip
   lines, drop empty lines, join with single newlines

Runs inside an Arrow-batched pandas UDF on executors (see spark/job.py).
"""

from __future__ import annotations

import html as _html
import re
from typing import Union

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_CDATA_RE = re.compile(r"<!\[CDATA\[.*?\]\]>", re.DOTALL)

_DROP_ELEMENTS = (
    "script", "style", "noscript", "template", "svg", "head",
    "nav", "footer", "header", "aside", "form", "iframe", "button",
)
_DROP_RE = re.compile(
    r"<(" + "|".join(_DROP_ELEMENTS) + r")\b[^>]*>.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)

_BLOCK_ELEMENTS = (
    "address", "article", "blockquote", "br", "caption", "dd", "div", "dl",
    "dt", "fieldset", "figcaption", "figure", "h1", "h2", "h3", "h4", "h5",
    "h6", "header", "hr", "li", "main", "ol", "p", "pre", "section",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
)
_BLOCK_TAG_RE = re.compile(
    r"</?(" + "|".join(_BLOCK_ELEMENTS) + r")\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]*>")
_BLANKS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_html(html: Union[bytes, bytearray, memoryview, str, None]) -> str:
    """Extract main text from an HTML document, deterministically."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    raw = _COMMENT_RE.sub(" ", raw)
    raw = _CDATA_RE.sub(" ", raw)
    raw = _DROP_RE.sub(" ", raw)
    raw = _BLOCK_TAG_RE.sub("\n", raw)
    raw = _ANY_TAG_RE.sub("", raw)
    raw = _html.unescape(raw)
    return normalize_text(raw)


def normalize_text(raw: str) -> str:
    """Whitespace normalization shared by the extractor and the fixture
    generator (which must produce text that is a fixed point of it)."""
    lines = []
    for line in raw.split("\n"):
        line = _BLANKS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# DOM-heuristic main-content extraction (north rule: "DOM heuristics")
# ---------------------------------------------------------------------------

from html.parser import HTMLParser as _HTMLParser  # noqa: E402

_MAIN_BLOCK_TAGS = frozenset(_BLOCK_ELEMENTS) - {"br", "hr"}
_MAIN_DROP_TAGS = frozenset(_DROP_ELEMENTS)


class _BlockCollector(_HTMLParser):
    """Collect text blocks with per-block link-character counts.

    A deterministic, stdlib-only DOM pass: text accumulates into the
    innermost open block element; characters inside <a> count toward the
    block's link mass.  No scoring happens here — see
    :func:`extract_main_content`."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks = []           # (text, link_chars) in document order
        self._buf: list = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0

    def _flush(self):
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append((text, self._link_chars))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _MAIN_DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth += 1
        elif tag in _MAIN_BLOCK_TAGS:
            self._flush()
        elif tag == "br":
            self._buf.append("\n")

    def handle_endtag(self, tag):
        if tag in _MAIN_DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        elif tag in _MAIN_BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_main_content(html, min_block_chars: int = 40,
                         max_link_density: float = 0.35) -> str:
    """Readability-style main-content extraction: parse the DOM into text
    blocks, drop navigation/boilerplate by the classic link-density +
    length heuristic (a block that is mostly anchor text, or too short to
    be prose, is chrome), keep the rest in document order.

    Deterministic pure function like :func:`extract_html` (which remains
    the byte-identity fixture contract — this mode trades recall for
    boilerplate precision and is selected per job via
    ``--extract-mode main``).  Runs in the same Arrow-batched executor
    pass; per-document cost is one linear HTMLParser scan."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _BlockCollector()
    parser.feed(html)
    parser.close()
    kept = []
    for text, link_chars in parser.blocks:
        stripped = normalize_text(text)
        if not stripped:
            continue
        if len(stripped) < min_block_chars:
            continue
        if link_chars / max(len(stripped), 1) > max_link_density:
            continue
        kept.append(stripped)
    return "\n".join(kept)


# ---------------------------------------------------------------------------
# PDF text extraction (north rule: "PDF/layout parse")
# ---------------------------------------------------------------------------

_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PDF_TEXT_OP_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"   # (..) Tj and (..) '
    rb"|\[(?P<arr>(?:[^\]\\]|\\.)*)\]\s*TJ"       # [(..) -120 (..)] TJ
    rb"|(?P<nl>T\*|TD|Td)",                       # line moves -> newline
    re.DOTALL)
_PDF_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.DOTALL)
_PDF_ESCAPE_RE = re.compile(rb"\\(?:[0-7]{1,3}|.)", re.DOTALL)


def _pdf_unescape(raw: bytes) -> bytes:
    def sub(m):
        e = m.group(0)[1:]
        if e[:1].isdigit():
            return bytes([int(e, 8) & 0xFF])
        return {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                b"f": b"\f"}.get(e, e)
    return _PDF_ESCAPE_RE.sub(sub, raw)


def extract_pdf(payload) -> str:
    """Text extraction from simple PDFs, stdlib-only and deterministic.

    Scope (documented, honest): content streams stored raw or
    FlateDecode-compressed (zlib is stdlib), text shown with Tj / ' / TJ
    operators in a standard single-byte or UTF-16 encoding; Td/TD/T*
    line-move operators become newlines.  CJK/CID-keyed fonts, ToUnicode
    CMaps and encrypted PDFs are out of scope — at 10^12-document scale
    those route to a codec-equipped extraction service, but the common
    crawl-PDF case (Flate + simple fonts) is handled here for real."""
    import zlib

    if payload is None:
        return ""
    data = bytes(payload)
    pieces = []
    for m in _PDF_STREAM_RE.finditer(data):
        body = m.group(1)
        try:
            body = zlib.decompress(body)
        except zlib.error:
            pass  # stored raw (or a filter we do not support)
        for op in _PDF_TEXT_OP_RE.finditer(body):
            if op.group("nl") is not None:
                pieces.append(b"\n")
            elif op.group("s") is not None:
                pieces.append(_pdf_unescape(op.group("s")))
            else:
                for s in _PDF_ARR_STR_RE.findall(op.group("arr")):
                    pieces.append(_pdf_unescape(s[1:-1]))
    text = b"".join(pieces)
    if text[:2] in (b"\xfe\xff", b"\xff\xfe"):
        decoded = text.decode("utf-16", errors="replace")
    else:
        decoded = text.decode("utf-8", errors="replace")
    return normalize_text(decoded)


_PDF_MAGIC = b"%PDF-"
_HTML_HINT_RE = re.compile(rb"<(?:!doctype|html|head|body|div|p|a)\b",
                           re.IGNORECASE)


def extract_payload(payload, mode: str = "strip") -> str:
    """Dispatch extraction by payload type: PDF magic -> :func:`extract_pdf`;
    HTML-looking bytes -> :func:`extract_html` (``mode='strip'``) or
    :func:`extract_main_content` (``mode='main'``); anything else decodes
    as plain text + normalization."""
    if payload is None:
        return ""
    data = bytes(payload) if not isinstance(payload, str) else None
    if data is not None and data[:5] == _PDF_MAGIC:
        return extract_pdf(data)
    raw = data if data is not None else payload
    probe = raw[:2048] if data is not None else raw[:2048].encode(
        "utf-8", errors="replace")
    if _HTML_HINT_RE.search(probe):
        if mode == "main":
            return extract_main_content(raw)
        return extract_html(raw)
    if data is not None:
        raw = data.decode("utf-8", errors="replace")
    return normalize_text(raw)

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

"""Deterministic synthetic web-pages corpus (FIXTURES.md contract).

Generates the Common-Crawl-style input table
``web_pages(url, warc_ts, html, text, lang)`` with three strata:

1. golden OCR texts from the reference test suite (byte-exact),
2. micro-case texts from the reference unit tests,
3. a seeded bulk OCR-noise corpus that plants model phrases into filler
   text and corrupts them through a fixed confusion channel; document
   lengths are log-normal with a heavy tail to exercise skew/salting.

Invariant: for every row, ``extract.extract_html(html) == text`` byte-for-
byte (the html is built by wrapping the text in a fixed page template whose
boilerplate the extractor provably strips).  Seeded, no wall clock, no uuid.
"""

from __future__ import annotations

import datetime as _dt
import math
import random
from typing import Dict, Iterator, List, Optional, Tuple

from fuzzy_search_spark.extract import extract_html, normalize_text

EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

GOLDEN_TEXTS: Dict[str, str] = {
    "golden-nl-1": (
        "ie Veucris den 5. Januaris 1725. PR&ASIDE, Den Heere Bentinck. "
        "PRASENTIEBUS, De Heeren Jan Welderen , van Dam, Torck , met een "
        "extraordinaris Gedeputeerde uyt de Provincie van Gelderlandt. Van "
        "Maasdam , vanden Boetzelaer , Noordwyck , met een extraordinaris "
        "Gedeputeerde uyt de Provincie van Hollandt ende Westvrieslandt. "
        "Velters, Ockersse , Noey; van Hoorn , met een extraordinaris "
        "Gedeputeerde uyt de Provincie van Zeelandt. Van Renswoude , van "
        "Voor{t. Van Schwartzenbergh, vander Waayen, Vegilin Van Claerbergen."
    ),
    "golden-nl-2": (
        "Mercuri: den 10. Jangarii, 1725. ia PRESIDE, Den Heere an "
        "Iddekinge. PRA&SENTIBUS, De Heeren /an Welderen , van Dam, van "
        "Wynbergen, Torck, met een extraordinaris Gedeputeerde uyt de "
        "Provincie van Gelderland. Van Maasdam , van der Goes , "
        "Raadtpenfionaris van Hoornbeeck"
    ),
}

MICRO_CASES: Dict[str, str] = {
    "case-basic": "this is a test",
    "case-repeat": "a test is a test is a test",
    "case-typos": "This text consaint some typos.",
    "case-typos-upper": "This text CONSAINT some typos.",
    "case-typos-suffix": "This text containsi some typos.",
    "case-repetition": "This text contains contains some repetition.",
    "case-partial": "This text con contains some weirdness.",
    "case-coffy": "For sale two units of coffy.",
    "case-ocr1": "door de Alakei&ers by na gecompletecrt",
    "case-ocr2": "TS gehoort het rapport van de Heeren I van Lynden",
    "case-admiralty1": "aaniraliteyten in het gemeen",
    "case-admiralty2": "AduiraliteytVrieslaidt",
    "case-missive": "DONtfangen een Missive van den Heere vander Goes",
    "case-split-exact": (
        "Ntfangen een Missive van den Gouverneur Generaal van het eiland "
        "Amoras, verfoekende, dat dit beter getest moet worden."
    ),
    "case-token-1": "This is a test in which we are testing",
    "case-token-2": "The purpose is testing",
    "case-token-3": "We are test ing",
    "case-token-4": "This is a testcase",
    "case-token-5": "This is a best test case",
    "case-token-6": "this is a best test case to test best case matching",
    "case-token-7": "a document for a test",
    "case-token-8": "this is a test best case",
    "case-token-9": "this is a time to rest",
    "case-token-10": "test case",
}

#: README domain model (README.md:27-49).
README_MODEL: List[dict] = [
    {"phrase": "PRAESIDE"},
    {"phrase": "PRAESENTIBUS"},
    {"phrase": "Veneris"},
    {"phrase": "Mercurii"},
    {"phrase": "den .. Januarii 1725"},
]

README_CONFIG = {
    "char_match_threshold": 0.6,
    "ngram_threshold": 0.5,
    "levenshtein_threshold": 0.6,
    "ignorecase": False,
    "max_length_variance": 3,
    "ngram_size": 2,
    "skip_size": 2,
}

_FILLER_WORDS = (
    "de het een van den der in op met voor aan door wordt zijn als ende "
    "heeren provincie vergadering missive rapport resolutie advies commissie "
    "the of and to a in that is was for it with as his on be at by had lorem "
    "ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
).split()

_CONFUSIONS = [("s", "f"), ("u", "n"), ("e", "c"), ("i", "l"), ("a", "&"),
               ("r", "t"), ("o", "0")]

_PAGE_TEMPLATE = (
    "<html><head><title>Page {i}</title>"
    "<style>body {{ margin: 0; }}</style>"
    "<script>var tracked = {i};</script></head>"
    "<body><nav><ul><li>Home</li><li>Archief</li></ul></nav>"
    "<header><h1>Resolutie {i}</h1></header>"
    "<main>{body}</main>"
    "<footer>&copy; 1725 Staten-Generaal</footer></body></html>"
)


def ocr_corrupt(s: str, rng: random.Random, char_p: float = 0.05,
                indel_p: float = 0.02) -> str:
    """Fixed-confusion-table OCR noise channel (seeded per caller)."""
    out = []
    for ch in s:
        r = rng.random()
        if r < char_p:
            for a, b in _CONFUSIONS:
                if ch == a:
                    ch = b
                    break
                if ch == b:
                    ch = a
                    break
        if r > 1.0 - indel_p:
            continue  # deletion
        out.append(ch)
        if rng.random() < indel_p:
            out.append(rng.choice("abcdefg .,"))  # insertion
    return "".join(out)


def _bulk_text(rng: random.Random, phrases: List[str], target_chars: int,
               phrase_rate: float = 0.02) -> str:
    parts: List[str] = []
    size = 0
    while size < target_chars:
        if rng.random() < phrase_rate:
            phrase = rng.choice(phrases)
            piece = ocr_corrupt(phrase, rng) if rng.random() < 0.7 else phrase
        else:
            piece = rng.choice(_FILLER_WORDS)
        parts.append(piece)
        size += len(piece) + 1
        if rng.random() < 0.07:
            parts.append("\n")
    return " ".join(parts).replace(" \n ", "\n")


def _page_html(i: int, text: str) -> bytes:
    # paragraphs per text line; extractor maps each back to one line
    body = "".join(f"<p>{_escape(line)}</p>" for line in text.split("\n"))
    return _PAGE_TEMPLATE.format(i=i, body=body).encode("utf-8")


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def iter_web_pages(n_bulk: int = 1000, seed: int = 42,
                   median_chars: int = 2000, sigma: float = 1.0,
                   tail_docs_per_1k: int = 10, tail_chars: int = 200_000,
                   phrases: Optional[List[str]] = None,
                   phrase_rate: float = 0.02,
                   include_goldens: bool = True) -> Iterator[Tuple]:
    """Yield (url, warc_ts, html, text, lang) rows, deterministically.

    Document lengths are log-normal (median ``median_chars``) with
    ``tail_docs_per_1k`` giant documents per 1000 rows (~``tail_chars``
    chars) so one partition without salting would straggle.
    """
    phrase_strings = phrases or [p["phrase"] for p in README_MODEL]
    i = 0

    def row(suffix: str, text: str, lang: str):
        nonlocal i
        text = normalize_text(text)
        url = f"https://example.org/{suffix}"
        ts = EPOCH + _dt.timedelta(seconds=i)
        html = _page_html(i, text)
        assert extract_html(html) == text, f"extractor invariant broken: {url}"
        i += 1
        return url, ts, html, text, lang

    if include_goldens:
        for name, text in GOLDEN_TEXTS.items():
            yield row(name, text, "nl")
        for name, text in MICRO_CASES.items():
            yield row(name, text, "en")

    rng = random.Random(seed)
    for b in range(n_bulk):
        r = random.Random(seed * 1_000_003 + b)
        # giants are spread through the corpus (every ~100th doc), as in a
        # real crawl — clustering them would manufacture one straggler split
        if tail_docs_per_1k and b % (1000 // tail_docs_per_1k) == 7:
            chars = tail_chars
        else:
            chars = max(200, int(math.exp(
                math.log(median_chars) + sigma * r.gauss(0, 1))))
            chars = min(chars, 50_000)
        text = _bulk_text(r, phrase_strings, chars, phrase_rate)
        yield row(f"bulk/{b:08d}", text, "nl" if b % 3 else "en")


def web_pages_pandas(n_bulk: int = 1000, **kwargs):
    """The corpus as a pandas DataFrame (arrow-friendly dtypes)."""
    import pandas as pd

    rows = list(iter_web_pages(n_bulk=n_bulk, **kwargs))
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"])


def write_web_pages_parquet(path: str, n_bulk: int = 1000, n_files: int = 1,
                            **kwargs) -> int:
    """Materialize the corpus to parquet; returns the row count.

    With ``n_files > 1``, ``path`` becomes a directory of shard files
    (round-robin rows) — the natural crawl-shard layout, which gives Spark
    per-file scan parallelism without split-size tuning."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    df = web_pages_pandas(n_bulk=n_bulk, **kwargs)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    if n_files <= 1:
        table = pa.Table.from_pandas(df, preserve_index=False).cast(schema)
        pq.write_table(table, path, row_group_size=256)
        return len(df)
    os.makedirs(path, exist_ok=True)
    for f in range(n_files):
        shard = df.iloc[f::n_files]
        table = pa.Table.from_pandas(shard, preserve_index=False).cast(schema)
        pq.write_table(table, os.path.join(path, f"part-{f:05d}.parquet"),
                       row_group_size=256)
    return len(df)

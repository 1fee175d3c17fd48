"""Raw-crawl sources: parsers that turn archive bytes into page tables."""

from fuzzy_search_spark.sources.warc import (  # noqa: F401
    WarcRecord,
    build_warc,
    build_warc_record,
    decode_payload,
    iter_warc,
    read_warc,
    sniff_charset,
    synth_warc_files,
)

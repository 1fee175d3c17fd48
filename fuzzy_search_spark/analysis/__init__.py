"""Corpus-level analytics (the reference's analysis layer, re-expressed as
native DataFrame aggregations — SURVEY.md §2.7)."""

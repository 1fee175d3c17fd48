"""Shim package so the reference library's lazy `from nltk.tokenize import
WordPunctTokenizer` works in this sandbox (test oracle only)."""

"""Chunked giant-document matching must equal whole-document matching."""

import random

import pytest

from fuzzy_search_spark.fixtures import README_CONFIG, README_MODEL, ocr_corrupt
from fuzzy_search_spark.matcher import find_matches, find_matches_chunked
from fuzzy_search_spark.model import compile_model


@pytest.fixture(scope="module")
def model():
    return compile_model(README_MODEL, README_CONFIG)


def test_small_doc_passthrough(model):
    text = "ie Veucris den 5. Januaris 1725. PR&ASIDE"
    assert find_matches_chunked(text, model) == find_matches(text, model)


def test_giant_doc_equality(model):
    rng = random.Random(11)
    fill = ["lorem", "ipsum", "heeren", "provincie", "van", "de"]
    parts = []
    for i in range(30_000):
        if rng.random() < 0.02:
            phrase = rng.choice([p["phrase"] for p in README_MODEL])
            parts.append(ocr_corrupt(phrase, rng) if rng.random() < 0.5
                         else phrase)
        else:
            parts.append(rng.choice(fill))
    text = " ".join(parts)
    whole = find_matches(text, model)
    assert len(whole) > 100
    for chunk_chars in (5_000, 17_001, 64_000):
        chunked = find_matches_chunked(text, model, chunk_chars=chunk_chars)
        assert chunked == whole, chunk_chars


def test_phrase_straddling_every_boundary(model):
    # place a match exactly across each chunk core boundary
    phrase = "den .. Januarii 1725"
    filler = "x" * 83
    text = (" " + phrase + " " + filler) * 200
    whole = find_matches(text, model)
    assert len(whole) == 200
    for chunk_chars in (1_000, 2_048, 4_097):
        chunked = find_matches_chunked(text, model, chunk_chars=chunk_chars)
        assert chunked == whole, chunk_chars


def test_max_offset_models_rejected(model):
    m = compile_model([{"phrase": "test", "max_start_offset": 3}], {})
    with pytest.raises(ValueError):
        find_matches_chunked("test " * 100_000, m, chunk_chars=1000)
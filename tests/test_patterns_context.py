"""Differential parity for the pattern context combinators against the
reference pattern/fuzzy_patterns.py (imported live, read-only)."""

import sys

import pytest

sys.path.insert(0, "tests/oracle_shims")
sys.path.insert(0, "/root/reference")

from fuzzy_search_spark import patterns as mine  # noqa: E402

ref = pytest.importorskip("fuzzy_search.pattern.fuzzy_patterns")

CONTEXTS = [
    "Makelaar",
    "Heer (van) Stad",
    r"a+b*c?d.e|f!g^h$i\j/k[l]m{n}o",
    "plain context",
]

# reference definitions carry group_indices — combinators must pass them
REF_PATTERN_NAMES = ["name", "name_and_name", "weekday_comma_day_month"]


def _strip(d):
    return {k: d.get(k) for k in ("name", "pattern", "group_indices")}


def test_escape_string_parity():
    for ctx in CONTEXTS:
        assert mine.escape_string(ctx) == ref.escape_string(ctx), ctx


@pytest.mark.parametrize("combinator", [
    "pattern_comma_then_context", "context_then_pattern",
    "pattern_before_context", "context_before_pattern",
])
def test_combinator_parity(combinator):
    f_mine = getattr(mine, combinator)
    f_ref = getattr(ref, combinator)
    for name in REF_PATTERN_NAMES:
        spec = ref.pattern_definitions[name]
        for ctx in CONTEXTS:
            esc = ref.escape_string(ctx)
            assert _strip(f_mine(name, spec, esc)) == _strip(
                f_ref(name, spec, esc)), (combinator, name, ctx)


def test_make_search_context_patterns_parity():
    for ctx in CONTEXTS:
        for ctype in (None, "person_name", "distance", "all"):
            got = mine.make_search_context_patterns(
                ctx, REF_PATTERN_NAMES,
                mine.get_context_patterns(ctype),
                ref.pattern_definitions)
            want = ref.make_search_context_patterns(
                ctx, REF_PATTERN_NAMES, ref.get_context_patterns(ctype))
            assert [_strip(g) for g in got] == [_strip(w) for w in want], \
                (ctx, ctype)


def test_registry_surfaces_match():
    assert mine.list_context_pattern_types("person_name") == \
        ref.list_context_pattern_types("person_name")
    assert mine.list_context_pattern_types() == ref.list_context_pattern_types()
    with pytest.raises(KeyError):
        mine.list_context_pattern_types("nope")
    with pytest.raises(KeyError):
        mine.get_context_patterns("nope")


def test_distance_quirk_documented():
    """The reference interpolates '.{d}'.format(d=10) -> '.10' (a literal,
    not a bounded gap); the parity combinator reproduces it and the
    _near_ variants implement the documented intent."""
    spec = {"pattern": "X", "group_indices": [0]}
    assert mine.pattern_before_context("p", spec, "C")["pattern"] == "X.10C"
    assert ref.pattern_before_context("p", spec, "C")["pattern"] == "X.10C"
    assert mine.pattern_near_context("p", spec, "C", 10)["pattern"] == \
        "X.{0,10}C"
    assert mine.context_near_pattern("p", spec, "C", 4)["pattern"] == \
        "C.{0,4}X"

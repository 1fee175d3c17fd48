"""Unit tests for regex entity patterns and spelling-shift linking."""

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    import os

    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = get_spark(master="local[2]", app_name="patterns-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def test_pattern_extraction(spark):
    from fuzzy_search_spark.patterns import extract_patterns

    text = ("Anthony van der Truyn en Adriaen Bosman, Makelaers tot "
            "Rotterdam, zullen op woensdag, den 12 maart 1742, 's middags "
            "ten twee uuren precies, in de Brakke Grond verkopen")
    df = spark.createDataFrame([("d1", text)], "url string, text string")
    hits = {(r.pattern_name, r.match)
            for r in extract_patterns(df).collect()}
    assert ("year", "1742") in hits
    assert ("day_month", "12 maart") in hits
    assert ("day_part", "'s middags") in hits
    assert ("in_place", "tot Rotterdam") in hits
    assert any(n == "person_name" and "Truyn" in m for n, m in hits)
    assert any(n == "weekday_day_month" for n, _ in hits)


def test_spelling_shift_linking(spark):
    from fuzzy_search_spark.analysis.spelling import (
        frequency_change,
        spelling_shifts,
    )

    c1 = spark.createDataFrame(
        [("praeside was here praeside again praeside praeside praeside",)],
        "text string")
    c2 = spark.createDataFrame(
        [("preside was here preside again preside preside preside",)],
        "text string")
    fc = {r.word: r.change_level
          for r in frequency_change(c1, c2, min_freq=3).collect()}
    assert fc["praeside"] == "disappear"
    assert fc["preside"] == "emerge"

    shifts = spelling_shifts(c1, c2, min_freq=3,
                             similarity_threshold=0.3).collect()
    linked = {(r.drop_word, r.jump_word, r.change_type) for r in shifts}
    assert ("praeside", "preside", "replace") in linked

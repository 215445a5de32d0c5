"""Unit tests: Ethiopian calendar, MySQL date-semantics helpers, text
functions (SURVEY.md §5.3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.functions.datetime_ext import (
    complete_months_between,
    complete_years_between,
    period_diff_months,
)
from data_export_tool_spark.functions.ethiopian import (
    eth_to_gregorian,
    gregorian_to_eth,
    gregorian_to_eth_py,
)


# ---- Ethiopian calendar (U1/U3) ------------------------------------------

KNOWN_PAIRS = [
    # (gregorian, (eth_year, eth_month, eth_day))
    (dt.date(1970, 1, 1), (1962, 4, 23)),
    (dt.date(2023, 9, 12), (2016, 1, 1)),  # Ethiopian new year (non-leap-eve)
    (dt.date(2023, 9, 11), (2015, 13, 6)),  # Pagume 6 (eve of 2016, leap)
    (dt.date(2024, 9, 11), (2017, 1, 1)),
    (dt.date(2023, 7, 28), (2015, 11, 21)),
    (dt.date(2023, 8, 26), (2015, 12, 20)),
]


@pytest.mark.parametrize("greg,eth", KNOWN_PAIRS)
def test_gregorian_to_eth_known_dates(greg, eth):
    assert gregorian_to_eth_py(greg) == eth


@pytest.mark.parametrize("greg,eth", KNOWN_PAIRS)
def test_eth_to_gregorian_known_dates(greg, eth):
    y, m, d = eth
    assert eth_to_gregorian(y, m, d) == greg


def test_eth_roundtrip_40_years():
    d = dt.date(1990, 1, 1)
    while d < dt.date(2030, 1, 1):
        y, m, day = gregorian_to_eth_py(d)
        assert eth_to_gregorian(y, m, day) == d, d
        assert 1 <= m <= 13 and 1 <= day <= 30
        d += dt.timedelta(days=17)


def test_eth_column_expression_matches_python(spark):
    dates = [
        (dt.date(1995, 1, 2),),
        (dt.date(1996, 2, 29),),
        (dt.date(2011, 9, 11),),
        (dt.date(2023, 9, 12),),
        (None,),
    ]
    df = spark.createDataFrame(dates, "d date")
    out = df.select(gregorian_to_eth(F.col("d")).alias("et")).collect()
    for (d,), row in zip(dates, out):
        if d is None:
            # concat_ws never returns NULL; NULL date → empty string
            assert row.et == "" or row.et is None
        else:
            y, m, day = gregorian_to_eth_py(d)
            assert row.et == f"{day}/{m}/{y}"


def test_eth_sql_function_matches_python(spark):
    from data_export_tool_spark.functions.ethiopian import register_sql_functions

    register_sql_functions(spark)
    spark.createDataFrame(
        [(dt.date(2023, 9, 12),), (dt.date(1996, 2, 29),), (None,)], "d date"
    ).createOrReplaceTempView("eth_sql_t")
    rows = spark.sql(
        "SELECT fn_gregorian_to_ethiopian_calendar(d, 'D/M/Y') AS dmy, "
        "fn_gregorian_to_ethiopian_calendar(d, 'Y-M-D') AS ymd FROM eth_sql_t"
    ).collect()
    for (d,), row in zip(
        [(dt.date(2023, 9, 12),), (dt.date(1996, 2, 29),), (None,)], rows
    ):
        if d is None:
            assert row.dmy is None and row.ymd is None
        else:
            y, m, day = gregorian_to_eth_py(d)
            assert row.dmy == f"{day}/{m}/{y}"
            assert row.ymd == f"{y}-{m}-{day}"
    # unsupported format raises (parity with gregorian_to_eth)
    import pytest as _pytest

    with _pytest.raises(Exception, match="unsupported Ethiopian date format"):
        spark.sql(
            "SELECT fn_gregorian_to_ethiopian_calendar(d, 'bogus') FROM eth_sql_t"
        ).collect()


# ---- MySQL complete-unit date semantics (F11/F13) ------------------------


def _one_row(spark, a: dt.date, b: dt.date):
    return spark.createDataFrame([(a, b)], "a date, b date")


@pytest.mark.parametrize(
    "a,b,months",
    [
        (dt.date(2020, 1, 15), dt.date(2020, 3, 10), 1),  # day not reached
        (dt.date(2020, 1, 15), dt.date(2020, 3, 15), 2),  # exactly reached
        (dt.date(2020, 1, 31), dt.date(2020, 2, 29), 0),  # leap-Feb edge
        (dt.date(2020, 1, 31), dt.date(2020, 3, 31), 2),
        (dt.date(2020, 3, 10), dt.date(2020, 1, 15), -2),  # negative window
    ],
)
def test_complete_months_between(spark, a, b, months):
    row = (
        _one_row(spark, a, b)
        .select(complete_months_between(F.col("a"), F.col("b")).alias("m"))
        .first()
    )
    assert row.m == months


@pytest.mark.parametrize(
    "a,b,years",
    [
        (dt.date(2000, 6, 15), dt.date(2020, 6, 14), 19),
        (dt.date(2000, 6, 15), dt.date(2020, 6, 15), 20),
        (dt.date(2000, 2, 29), dt.date(2019, 2, 28), 18),  # leap birthday
    ],
)
def test_complete_years_between(spark, a, b, years):
    row = (
        _one_row(spark, a, b)
        .select(complete_years_between(F.col("a"), F.col("b")).alias("y"))
        .first()
    )
    assert row.y == years


def test_period_diff_ignores_days(spark):
    row = (
        _one_row(spark, dt.date(2020, 1, 31), dt.date(2020, 3, 1))
        .select(period_diff_months(F.col("b"), F.col("a")).alias("m"))
        .first()
    )
    assert row.m == 2  # PERIOD_DIFF(202003, 202001)


# ---- text functions -------------------------------------------------------


def test_token_count_and_quality(spark):
    from data_export_tool_spark.functions.text import (
        language_guess,
        quality_score,
        token_count,
    )

    df = spark.createDataFrame(
        [
            ("the cat and the hat is a cat", "en"),
            ("der hund und die katze ist das", "de"),
            ("le chat et la vache est les", "fr"),
            ("", None),
        ],
        "text string, expected string",
    )
    rows = df.select(
        token_count(F.col("text")).alias("n"),
        language_guess(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        "expected",
    ).collect()
    assert rows[0].n == 8 and rows[0].lang == "en"
    assert rows[1].lang == "de"
    assert rows[2].lang == "fr"
    for r in rows[:3]:
        assert 0.0 <= r.q <= 1.0
    assert rows[3].lang == "und"


def test_bpe_token_count_and_stopword_ratio(spark):
    from data_export_tool_spark.functions.text import stopword_ratio, token_count

    df = spark.createDataFrame(
        [("the cat, the hat!",), ("hello world",)], "text string"
    )
    rows = df.select(
        token_count(F.col("text")).alias("ws"),
        token_count(F.col("text"), bpe=True).alias("bpe"),
        F.round(stopword_ratio(F.col("text")), 6).alias("sw"),
    ).collect()
    # whitespace: 4 tokens; BPE-ish also counts the ',' and '!' runs
    assert rows[0].ws == 4 and rows[0].bpe == 6
    assert rows[0].sw == 0.5  # 'the' twice out of 4 whitespace tokens
    assert rows[1].ws == 2 and rows[1].bpe == 2 and rows[1].sw == 0.0


def test_token_count_empty_and_bpe_agree(spark):
    from pyspark.sql import functions as F

    from data_export_tool_spark.functions.text import token_count

    df = spark.createDataFrame(
        [("",), ("   ",), ("one two",), (None,)], "text string"
    )
    rows = df.select(
        token_count(F.col("text")).alias("ws"),
        token_count(F.col("text"), bpe=True).alias("bpe"),
    ).collect()
    assert [r.ws for r in rows] == [0, 0, 2, None]
    # empty/whitespace must agree across modes (split('') yields [""])
    assert rows[0].bpe == 0 and rows[1].bpe == 0


def test_punct_ratio_unicode_letters_not_punctuation(spark):
    from pyspark.sql import functions as F

    from data_export_tool_spark.functions.text import punct_ratio

    df = spark.createDataFrame(
        [("schöne Grüße für Sie",), ("hello, world!",)], "text string"
    )
    rows = df.select(F.round(punct_ratio(F.col("text")), 3).alias("p")).collect()
    assert rows[0].p == 0.0  # accented letters are letters, not punct
    assert 0.0 < rows[1].p < 0.2  # the comma and bang still count


def test_language_guess_unsegmented_zh(spark):
    from pyspark.sql import functions as F

    from data_export_tool_spark.functions.text import language_guess

    df = spark.createDataFrame(
        [("这是一个测试，的确如此",), ("the cat and the hat is a cat",)],
        "text string",
    )
    rows = df.select(language_guess(F.col("text")).alias("g")).collect()
    assert rows[0].g == "zh"  # substring probes fire without whitespace
    assert rows[1].g == "en"

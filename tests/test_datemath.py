"""DateMathParser re-expression (DateMathParser.java:138) semantics."""

from datetime import datetime

import pytest

from lucene_solr_ray.functions.datemath import DateMathError, parse_date_math

NOW = datetime(2024, 1, 22, 12, 34, 56, 789000)


def dm(s):
    return parse_date_math(s, NOW)


def test_now_and_rounding():
    assert dm("NOW") == NOW
    assert dm("NOW/DAY") == datetime(2024, 1, 22)
    assert dm("NOW/HOUR") == datetime(2024, 1, 22, 12)
    assert dm("NOW/MINUTE") == datetime(2024, 1, 22, 12, 34)
    assert dm("NOW/SECOND") == datetime(2024, 1, 22, 12, 34, 56)
    assert dm("NOW/MONTH") == datetime(2024, 1, 1)
    assert dm("NOW/YEAR") == datetime(2024, 1, 1)
    assert dm("NOW/MILLI") == NOW  # already whole millis
    assert parse_date_math("NOW/MILLI",
                           NOW.replace(microsecond=789654)) == NOW


def test_arithmetic_and_chains():
    assert dm("NOW-7DAYS") == datetime(2024, 1, 15, 12, 34, 56, 789000)
    assert dm("NOW-7DAY/DAY") == datetime(2024, 1, 15)
    assert dm("NOW+2HOURS") == datetime(2024, 1, 22, 14, 34, 56, 789000)
    assert dm("NOW+1DAY-1MILLI") == \
        datetime(2024, 1, 23, 12, 34, 56, 788000)
    # javadoc example: NOW+6MONTHS+3DAYS/DAY
    assert dm("NOW+6MONTHS+3DAYS/DAY") == datetime(2024, 7, 25)
    # left-to-right: rounding then arithmetic differs from the reverse
    assert dm("NOW/DAY+1HOUR") == datetime(2024, 1, 22, 1)
    assert dm("NOW+1HOUR/DAY") == datetime(2024, 1, 22)


def test_month_clamping_like_localdatetime():
    jan31 = datetime(2024, 1, 31, 10, 0, 0)
    assert parse_date_math("NOW+1MONTH", jan31) == \
        datetime(2024, 2, 29, 10, 0, 0)  # leap year clamp
    assert parse_date_math("NOW+1MONTH", datetime(2023, 1, 31)) == \
        datetime(2023, 2, 28)
    assert parse_date_math("NOW-1YEAR", datetime(2024, 2, 29)) == \
        datetime(2023, 2, 28)


def test_explicit_date_anchor():
    assert parse_date_math("2024-03-05T08:00:00Z") == \
        datetime(2024, 3, 5, 8)
    assert parse_date_math("2024-03-05T08:15:30Z/DAY+1HOUR") == \
        datetime(2024, 3, 5, 1)
    assert parse_date_math("2024-03-05T08:15:30.25Z") == \
        datetime(2024, 3, 5, 8, 15, 30, 250000)


def test_string_now_pin():
    assert parse_date_math("NOW-1DAY", "2024-01-22T12:34:56Z") == \
        datetime(2024, 1, 21, 12, 34, 56)


def test_errors_match_reference_vocabulary():
    for bad in ["NOW/WEEK",            # consciously unsupported
                "NOW+1WEEK",
                "NOW*3DAYS",           # unrecognized command
                "NOW+DAYS",            # missing value
                "NOW+1",               # missing unit
                "2024-01-22",          # no Z
                "garbageZ",
                "NOW/DAY+garbage"]:
        with pytest.raises(DateMathError):
            dm(bad)

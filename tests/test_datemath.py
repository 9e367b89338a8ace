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


def test_date_range_facet_calendar_months(ray_session):
    """+1MONTH gap steps CALENDAR months (DateRangeEndpointCalculator):
    Feb is 29 days in 2024, so fixed-stride bucketing would misplace
    boundary values."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucene_solr_ray.pipelines.relational import date_range_facet

    ts = [np.datetime64(x, "us") for x in
          ["2023-12-31T23:59:59", "2024-01-15T00:00:00",
           "2024-01-31T23:59:59", "2024-02-01T00:00:00",
           "2024-02-29T12:00:00", "2024-03-01T00:00:00",
           "2024-03-31T23:59:59", "2024-04-01T00:00:00"]]
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts,
                                                pa.timestamp("us"))}))
    got = dict(date_range_facet(
        ds, "ts", "2024-01-01T00:00:00Z", "2024-04-01T00:00:00Z",
        "+1MONTH").to_pandas().itertuples(index=False, name=None))
    assert got["2024-01-01T00:00:00Z"] == 2
    assert got["2024-02-01T00:00:00Z"] == 2   # incl. Feb 29 midday
    assert got["2024-03-01T00:00:00Z"] == 2
    assert got["before"] == 1 and got["after"] == 1
    assert got["between"] == 6


def test_date_range_facet_datemath_endpoints(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucene_solr_ray.pipelines.relational import date_range_facet

    ts = [np.datetime64("2024-01-20T06:00:00", "us"),
          np.datetime64("2024-01-21T06:00:00", "us"),
          np.datetime64("2024-01-10T00:00:00", "us")]
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts,
                                                pa.timestamp("us"))}))
    got = dict(date_range_facet(
        ds, "ts", "NOW/DAY-2DAYS", "NOW/DAY", "+1DAY",
        now="2024-01-22T12:00:00Z").to_pandas()
        .itertuples(index=False, name=None))
    assert got["2024-01-20T00:00:00Z"] == 1
    assert got["2024-01-21T00:00:00Z"] == 1
    assert got["before"] == 1 and got["after"] == 0

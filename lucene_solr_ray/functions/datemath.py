"""Solr date-math expressions (``NOW-7DAYS/DAY``, ``2024-01-01T00:00:00Z+1MONTH``).

Re-expression of ``solr/core/src/java/org/apache/solr/util/
DateMathParser.java:138`` (units map :141-175, add :182, round :197,
parse loop :343-407): an anchor instant (``NOW`` or an ISO-8601 ``...Z``
date) followed by any sequence of ``+<n><UNIT>`` / ``-<n><UNIT>``
arithmetic and ``/<UNIT>`` floor-rounding commands, evaluated left to
right in UTC. ``WEEK`` is consciously unsupported, matching the
reference (DateMathParser.java:143-149). Month/year arithmetic clamps
the day-of-month exactly like ``LocalDateTime.plus`` (Jan 31 + 1MONTH =
Feb 28/29).

The evaluated result is a scalar endpoint, so range filters and
histogram bounds stay pushdown-able pyarrow expressions — the math never
runs per row.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

__all__ = ["parse_date_math", "DateMathError"]


class DateMathError(ValueError):
    """Invalid date-math string (SolrException BAD_REQUEST analog)."""


# DateMathParser.CALENDAR_UNITS (java.time ChronoUnit keys)
_UNITS = {}
for _names, _unit in [
    (("YEAR", "YEARS"), "year"),
    (("MONTH", "MONTHS"), "month"),
    (("DAY", "DAYS", "DATE"), "day"),
    (("HOUR", "HOURS"), "hour"),
    (("MINUTE", "MINUTES"), "minute"),
    (("SECOND", "SECONDS"), "second"),
    (("MILLI", "MILLIS", "MILLISECOND", "MILLISECONDS"), "milli"),
]:
    for _n in _names:
        _UNITS[_n] = _unit

_OP = re.compile(r"/([A-Z]+)|([+-])(\d+)([A-Z]+)")

_ISO = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?Z")


def _add_months(t: datetime, n: int) -> datetime:
    m = t.month - 1 + n
    y = t.year + m // 12
    m = m % 12 + 1
    d = min(t.day, calendar.monthrange(y, m)[1])
    return t.replace(year=y, month=m, day=d)


def _add(t: datetime, val: int, unit_tok: str) -> datetime:
    unit = _UNITS.get(unit_tok)
    if unit is None:
        raise DateMathError(f"Adding Unit not recognized: {unit_tok!r}")
    if unit == "year":
        return _add_months(t, 12 * val)
    if unit == "month":
        return _add_months(t, val)
    delta = {"day": timedelta(days=val), "hour": timedelta(hours=val),
             "minute": timedelta(minutes=val),
             "second": timedelta(seconds=val),
             "milli": timedelta(milliseconds=val)}[unit]
    return t + delta


def _round(t: datetime, unit_tok: str) -> datetime:
    unit = _UNITS.get(unit_tok)
    if unit is None:
        raise DateMathError(f"Rounding Unit not recognized: {unit_tok!r}")
    if unit == "year":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if unit == "month":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return t.replace(second=0, microsecond=0)
    if unit == "second":
        return t.replace(microsecond=0)
    # milli: truncate to whole milliseconds
    return t.replace(microsecond=t.microsecond // 1000 * 1000)


def _apply_math(t: datetime, math: str) -> datetime:
    pos = 0
    for m in _OP.finditer(math):
        if m.start() != pos:
            raise DateMathError(
                f"Unrecognized command at {math[pos:pos+10]!r}")
        if m.group(1) is not None:  # '/UNIT'
            t = _round(t, m.group(1))
        else:  # '+n UNIT' / '-n UNIT'
            val = int(m.group(3))
            if m.group(2) == "-":
                val = -val
            t = _add(t, val, m.group(4))
        pos = m.end()
    if pos != len(math):
        raise DateMathError(f"Unrecognized command at {math[pos:pos+10]!r}")
    return t


def parse_date_math(val: str, now: datetime | str | None = None) -> datetime:
    """Evaluate one Solr date-math string to a UTC datetime.

    ``now`` pins the ``NOW`` anchor (the reference's ``NOW=millis``
    request param / ``DateMathParser.setNow``); defaults to the current
    wall clock. Returns a naive datetime in UTC (matching the engine's
    ``timestamp[us]`` columns).
    """
    if isinstance(now, str):
        now = parse_date_math(now)
    if val.startswith("NOW"):
        if now is None:
            now = datetime.now(timezone.utc).replace(tzinfo=None)
        elif now.tzinfo is not None:
            now = now.astimezone(timezone.utc).replace(tzinfo=None)
        return _apply_math(now, val[len("NOW"):])
    zz = val.find("Z")
    if zz == -1:
        raise DateMathError(f"Invalid Date String: {val!r}")
    m = _ISO.fullmatch(val[:zz + 1])
    if not m:
        raise DateMathError(f"Invalid Date in Date Math String: {val!r}")
    frac = (m.group(7) or "").ljust(6, "0")
    anchor = datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)),
                      int(m.group(4)), int(m.group(5)), int(m.group(6)),
                      int(frac))
    return _apply_math(anchor, val[zz + 1:])

"""Date/time scalar surface — mee's ``utils/timeutil.py`` re-expressed.

The reference's config-time helpers (`utils/timeutil.py:16-67`):
``deltatotime('+1 week')`` (anchor + relativedelta), ``yesterday``-style
day arithmetic, and ``rangePeriod(start, delta)`` (the inclusive list of
'YYYY-MM-DD' days between two endpoints, used to expand date-partitioned
scans). Here they are column expressions — Catalyst folds them into the
scan predicates instead of the driver pre-computing strings:

* ``delta_col(anchor, '+1 week')`` → anchor + calendar interval
* ``yesterday_col(anchor)``        → day(anchor) - 1
* ``range_period_col(d0, d1)``     → inclusive array of days (F.sequence)

All forms are engine-portable (verified against a DuckDB oracle through
the ``rel_date_arithmetic`` / ``rel_date_ranges`` contract queries).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_NOW_RE = re.compile(r"^\s*now\s*$", re.I)
_DELTA_RE = re.compile(
    r"^\s*((?:[+-]?)\d+)\s*(second|minute|hour|day|week|month|year)(?:s?)\s*$",
    re.I)

# make_interval(years, months, weeks, days, hours, mins, secs) arg slots
_UNIT_SLOT = {"year": 0, "month": 1, "week": 2, "day": 3,
              "hour": 4, "minute": 5, "second": 6}


def parse_delta(deltastr: str) -> tuple[int, str] | None:
    """'+1 week' → (1, 'week'); 'now' → (0, 'day'); unparseable → None
    (the reference returns None for unknown delta strings)."""
    if _NOW_RE.match(deltastr):
        return (0, "day")
    m = _DELTA_RE.match(deltastr)
    if not m:
        return None
    return (int(m.group(1)), m.group(2).lower())


def delta_col(anchor: Column, deltastr: str) -> Column:
    """``deltatotime``: anchor timestamp + the parsed calendar delta.

    Calendar-aware (month/year arithmetic clamps at month ends exactly
    like dateutil.relativedelta and SQL INTERVAL)."""
    parsed = parse_delta(deltastr)
    if parsed is None:
        raise ValueError(f"unparseable delta: {deltastr!r}")
    value, unit = parsed
    args = [0] * 7
    args[_UNIT_SLOT[unit]] = value
    return anchor + F.expr(f"make_interval({', '.join(map(str, args))})")


def yesterday_col(anchor: Column) -> Column:
    """``yesterday``: the calendar day before anchor's day, as date."""
    return F.date_sub(F.to_date(anchor), 1)


def range_period_col(start_day: Column, end_day: Column) -> Column:
    """``rangePeriod``: inclusive array of days [start, end] (order-
    normalized like the reference, which swaps inverted endpoints)."""
    lo = F.least(start_day, end_day)
    hi = F.greatest(start_day, end_day)
    return F.sequence(lo, hi, F.expr("INTERVAL 1 DAY"))

"""Time-interval parsing and tumbling-bucket truncation.

The reference truncates a date/datetime column into fixed tumbling
intervals described by strings like ``"1d"``, ``"1h"``, ``"13h"`` or the
composite ``"1d1h"`` (reference: preprocess.py:164 ``dt.truncate``,
default "1d" at preprocess.py:47; README.md:199-201).

Spark mapping:
- calendar units (``1d``, ``1h``, ``1mo``, ``1y``, ``1w`` …) with count
  == 1 → ``F.date_trunc(unit, col)`` — pure Catalyst, vectorized.
- arbitrary / composite durations (``13h``, ``1d1h``, ``90m``) →
  epoch-floor arithmetic ``timestamp_seconds(floor(unix_timestamp(c)/s)*s)``
  — also pure Catalyst (whole-stage codegen), epoch-aligned exactly like
  Polars' ``dt.truncate`` (which aligns to the Unix epoch for duration
  intervals).

Months/quarters/years are not fixed-length and only make sense as
calendar truncation; mixing them with sub-day parts (e.g. "1mo1h") is
rejected, matching the semantic constraint (Polars rejects ambiguous
composites at truncate time too).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed-length units, in seconds.
_FIXED_SECONDS = {
    "ns": 1e-9,
    "us": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
    "w": 604800.0,
}

# Calendar units that map straight to Spark's date_trunc.
_CALENDAR_TRUNC = {"mo": "month", "q": "quarter", "y": "year"}

# date_trunc unit for single-count fixed units (faster + DST-safe path).
_SINGLE_TRUNC = {"s": "second", "m": "minute", "h": "hour", "d": "day", "w": "week"}

_TOKEN = re.compile(r"(\d+)(mo|ns|us|ms|m|s|h|d|w|q|y)")


def parse_interval(interval: str) -> tuple[str, float] | tuple[str, str]:
    """Parse an interval string into an execution strategy.

    Returns ``("seconds", total_seconds)`` for fixed-length intervals, or
    ``("calendar", spark_unit)`` for calendar units (month/quarter/year).

    >>> parse_interval("1d")
    ('seconds', 86400.0)
    >>> parse_interval("1d1h")
    ('seconds', 90000.0)
    >>> parse_interval("1mo")
    ('calendar', 'month')
    """
    s = interval.strip().lower().replace(" ", "")
    if not s:
        raise ValueError("empty interval string")
    pos = 0
    parts: list[tuple[int, str]] = []
    for m in _TOKEN.finditer(s):
        if m.start() != pos:
            raise ValueError(f"unparseable interval {interval!r} at {s[pos:]!r}")
        parts.append((int(m.group(1)), m.group(2)))
        pos = m.end()
    if pos != len(s):
        raise ValueError(f"unparseable interval {interval!r} at trailing {s[pos:]!r}")

    calendar = [p for p in parts if p[1] in _CALENDAR_TRUNC]
    fixed = [p for p in parts if p[1] in _FIXED_SECONDS]
    if calendar and fixed:
        raise ValueError(f"cannot mix calendar and fixed units in {interval!r}")
    if calendar:
        if len(calendar) > 1 or calendar[0][0] != 1:
            raise ValueError(f"calendar interval must be a single unit with count 1: {interval!r}")
        return ("calendar", _CALENDAR_TRUNC[calendar[0][1]])
    total = sum(n * _FIXED_SECONDS[u] for n, u in fixed)
    if total <= 0:
        raise ValueError(f"non-positive interval {interval!r}")
    return ("seconds", total)


def truncate_to_interval(col: Column, interval: str) -> Column:
    """A Column truncating timestamps to tumbling ``interval`` buckets.

    Pure Catalyst expressions only — stays inside whole-stage codegen.
    Bucket start is returned as a timestamp (mirrors Polars dt.truncate).
    """
    kind, val = parse_interval(interval)
    if kind == "calendar":
        return F.date_trunc(str(val), col)
    secs = float(val)
    if secs in (86400.0, 3600.0, 60.0, 1.0, 604800.0):
        unit = {86400.0: "day", 3600.0: "hour", 60.0: "minute", 1.0: "second", 604800.0: "week"}[secs]
        return F.date_trunc(unit, col)
    if secs >= 1.0 and secs == int(secs):
        isecs = int(secs)
        return F.timestamp_seconds(F.floor(F.unix_timestamp(col) / isecs) * isecs)
    # sub-second intervals: work in microseconds
    micros = int(round(secs * 1e6))
    return F.timestamp_micros((F.unix_micros(col) / micros).cast("long") * micros)

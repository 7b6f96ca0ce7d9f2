"""Solr date math (ref: solr/core/src/java/org/apache/solr/util/
DateMathParser.java:57 and DateField.parseMath): a base instant
("NOW" or an ISO-8601 literal ending in Z) followed by commands
``/UNIT`` (round down), ``+N UNIT`` and ``-N UNIT``, evaluated left to
right in UTC. Units are the reference's CALENDAR_UNITS table (YEAR(S),
MONTH(S), DAY(S)/DATE, HOUR(S), MINUTE(S), SECOND(S), MILLI(S)/
MILLISECOND(S); WEEK deliberately unsupported, DateMathParser.java:
121-126). Month/year adds clamp the day-of-month the way Calendar.add
does (Jan 31 + 1MONTH = Feb 28). The command string splits on
``\\b|(?<=\\d)(?=\\D)`` exactly like the reference's splitter."""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

_UNIT = {}
for _names, _u in ((("YEAR", "YEARS"), "year"),
                   (("MONTH", "MONTHS"), "month"),
                   (("DAY", "DAYS", "DATE"), "day"),
                   (("HOUR", "HOURS"), "hour"),
                   (("MINUTE", "MINUTES"), "minute"),
                   (("SECOND", "SECONDS"), "second"),
                   (("MILLI", "MILLIS", "MILLISECOND", "MILLISECONDS"),
                    "milli")):
    for _n in _names:
        _UNIT[_n] = _u

_SPLIT = re.compile(r"\b|(?<=\d)(?=\D)")
_ISO = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?Z?$")


def _add(dt: datetime, val: int, unit: str) -> datetime:
    if unit == "year":
        y = dt.year + val
        day = min(dt.day, calendar.monthrange(y, dt.month)[1])
        return dt.replace(year=y, day=day)
    if unit == "month":
        m = dt.month - 1 + val
        y, m = dt.year + m // 12, m % 12 + 1
        day = min(dt.day, calendar.monthrange(y, m)[1])
        return dt.replace(year=y, month=m, day=day)
    delta = {"day": timedelta(days=val), "hour": timedelta(hours=val),
             "minute": timedelta(minutes=val),
             "second": timedelta(seconds=val),
             "milli": timedelta(milliseconds=val)}[unit]
    return dt + delta


def _round(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    raise ValueError(f"No logic for rounding unit {unit!r}")


def parse_math(math: str, now: datetime) -> datetime:
    """Apply a command string ("/DAY+5DAYS-1MILLI") to `now`."""
    dt = now
    if not math:
        return dt
    ops = [t for t in _SPLIT.split(math) if t]
    pos = 0
    while pos < len(ops):
        cmd = ops[pos]
        pos += 1
        if len(cmd) != 1:
            raise ValueError(f"Multi character command found: {cmd!r}")
        if cmd == "/":
            if pos >= len(ops) or ops[pos] not in _UNIT:
                raise ValueError(f"Unit not recognized after '/': {ops[pos:]}")
            dt = _round(dt, _UNIT[ops[pos]])
            pos += 1
        elif cmd in "+-":
            if pos + 1 >= len(ops):
                raise ValueError(f"Need a value and unit for: {cmd!r}")
            try:
                val = int(ops[pos])
            except ValueError:
                raise ValueError(f"Not a Number: {ops[pos]!r}") from None
            unit = ops[pos + 1]
            if unit not in _UNIT:
                raise ValueError(f"Unit not recognized: {unit!r}")
            dt = _add(dt, -val if cmd == "-" else val, _UNIT[unit])
            pos += 2
        else:
            raise ValueError(f"Unrecognized command: {cmd!r}")
    return dt


def parse_date_math(value: str, now: datetime | None = None) -> datetime:
    """DateField.parseMath: "NOW<math>" or "<ISO-8601>Z<math>"
    -> aware UTC datetime."""
    value = value.strip()
    if value.startswith("NOW"):
        base = now if now is not None \
            else datetime.now(timezone.utc)
        if base.tzinfo is None:
            base = base.replace(tzinfo=timezone.utc)
        return parse_math(value[3:], base.astimezone(timezone.utc))
    # literal up to (and including) the 'Z'; math follows
    zi = value.find("Z")
    lit, math = (value[:zi + 1], value[zi + 1:]) if zi >= 0 else (value, "")
    m = _ISO.match(lit)
    if not m:
        raise ValueError(f"Invalid date string: {value!r}")
    y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    micros = int((frac or "0").ljust(3, "0")) * 1000
    base = datetime(y, mo, d, h, mi, s, micros, tzinfo=timezone.utc)
    return parse_math(math, base)


def epoch_millis(dt: datetime) -> int:
    return int(dt.timestamp() * 1000) if dt.tzinfo else \
        int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)

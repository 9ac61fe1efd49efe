"""STAC datetime interval parsing + normalization.

Ports the exact semantics of the reference:
- interval split / open ends / bare ".." invalid:
  crates/core/src/datetime.rs:20-70
- permissive parse (RFC3339, else naive %Y-%m-%dT%H:%M:%S[.f] as UTC):
  crates/core/src/datetime.rs:44-60
- partial-date expansion (year → full year, year-month → full month
  [leap-aware], date → full day; end-of-period = 23:59:59):
  crates/core/src/api/search.rs:361-439
- normalization to "start/end" RFC3339 with +00:00 offset, start>end
  error, both-open error: crates/core/src/api/search.rs:306-357

Verified against the reference's own 11-case test table
(crates/core/src/api/search.rs:526-721) in tests/test_datetime.py.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

_RFC3339 = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(?:[Zz]|([+-])(\d{2}):(\d{2}))$")
_NAIVE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?")
_YEAR = re.compile(r"^\d{4}$")
_YEAR_MONTH = re.compile(r"^(\d{4})-(\d{2})$")
_DATE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")


class DatetimeParseError(ValueError):
    pass


def parse_rfc3339(s: str) -> datetime:
    """Strict RFC3339 → aware UTC datetime."""
    m = _RFC3339.match(s.strip())
    if not m:
        raise DatetimeParseError(f"not RFC3339: {s!r}")
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    us = int(round(float(frac) * 1e6)) if frac else 0
    dt = datetime(y, mo, d, h, mi, sec, us, tzinfo=timezone.utc)
    if m.group(8):
        sign = -1 if m.group(8) == "-" else 1
        off = timedelta(hours=int(m.group(9)), minutes=int(m.group(10))) * sign
        dt = dt - off
    return dt


def parse_permissively(s: str) -> datetime:
    """RFC3339, else naive %Y-%m-%dT%H:%M:%S[.f] interpreted as UTC
    (reference datetime.rs:44-60)."""
    try:
        return parse_rfc3339(s)
    except DatetimeParseError:
        pass
    m = _NAIVE.match(s.strip())
    if not m:
        raise DatetimeParseError(f"unparseable datetime: {s!r}")
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    us = int(round(float(m.group(7)) * 1e6)) if m.group(7) else 0
    return datetime(y, mo, d, h, mi, sec, us, tzinfo=timezone.utc)


def _expand(s: str, end: bool) -> datetime:
    """Partial datetime → start/end of period (search.rs:361-439)."""
    t = s.strip()
    hms = (23, 59, 59) if end else (0, 0, 0)
    if _YEAR.match(t):
        y = int(t)
        return datetime(y, 12 if end else 1, 31 if end else 1, *hms,
                        tzinfo=timezone.utc)
    m = _YEAR_MONTH.match(t)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        if not 1 <= mo <= 12:
            raise DatetimeParseError(f"invalid month: {s!r}")
        d = calendar.monthrange(y, mo)[1] if end else 1
        return datetime(y, mo, d, *hms, tzinfo=timezone.utc)
    m = _DATE.match(t)
    if m:
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        return datetime(y, mo, d, *hms, tzinfo=timezone.utc)
    raise DatetimeParseError(f"unrecognized date format: {s!r}")


def _parse_bound(s: str, end: bool) -> datetime | None:
    if s == ".." or s == "":
        return None
    try:
        return parse_rfc3339(s)
    except DatetimeParseError:
        return _expand(s, end)


def parse_interval(s: str) -> tuple[datetime | None, datetime | None]:
    """Search datetime string → inclusive [start, end]; None = open.

    Single partial value expands to its full period; single RFC3339
    value becomes the degenerate [t, t] (search.rs:306-357).
    """
    if "/" in s:
        parts = s.split("/")
        if len(parts) != 2:
            raise DatetimeParseError(f"invalid interval: {s!r}")
        start = _parse_bound(parts[0], end=False)
        end = _parse_bound(parts[1], end=True)
        if start is None and end is None:
            raise DatetimeParseError("empty datetime interval")
        if start is not None and end is not None and end < start:
            raise DatetimeParseError(f"start is after end: {s!r}")
        return (start, end)
    if s == "..":
        raise DatetimeParseError('bare ".." is invalid')
    try:
        t = parse_rfc3339(s)
        return (t, t)
    except DatetimeParseError:
        return (_expand(s, end=False), _expand(s, end=True))


def _rfc3339_str(dt: datetime) -> str:
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        s += f".{dt.microsecond:06d}".rstrip("0")
    return s + "+00:00"


def normalize(s: str) -> str:
    """Reproduce Search::normalize_datetimes output strings
    (the 11-case table, search.rs:526-721)."""
    if "/" in s:
        start, end = parse_interval(s)
        a = _rfc3339_str(start) if start else ".."
        b = _rfc3339_str(end) if end else ".."
        return f"{a}/{b}"
    try:
        return _rfc3339_str(parse_rfc3339(s))
    except DatetimeParseError:
        start, end = parse_interval(s)
        return f"{_rfc3339_str(start)}/{_rfc3339_str(end)}"

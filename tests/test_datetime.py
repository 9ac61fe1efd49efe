"""Datetime normalization — the reference's own 11-case table
(crates/core/src/api/search.rs:526-721) ported verbatim."""

import pytest

from rustac_spark.stac.datetime_parse import (
    DatetimeParseError, normalize, parse_interval, parse_permissively,
)

CASES = [
    ("2023", "2023-01-01T00:00:00+00:00/2023-12-31T23:59:59+00:00"),
    ("2023-06", "2023-06-01T00:00:00+00:00/2023-06-30T23:59:59+00:00"),
    ("2023-06-10", "2023-06-10T00:00:00+00:00/2023-06-10T23:59:59+00:00"),
    ("2023-06-01T00:00:00Z", "2023-06-01T00:00:00+00:00"),
    ("2017/2018", "2017-01-01T00:00:00+00:00/2018-12-31T23:59:59+00:00"),
    ("2017-06/2017-07", "2017-06-01T00:00:00+00:00/2017-07-31T23:59:59+00:00"),
    ("2017-06-10/2017-06-11",
     "2017-06-10T00:00:00+00:00/2017-06-11T23:59:59+00:00"),
    ("2020-01-01/..", "2020-01-01T00:00:00+00:00/.."),
    ("../2020-12-31", "../2020-12-31T23:59:59+00:00"),
    ("2024-02", "2024-02-01T00:00:00+00:00/2024-02-29T23:59:59+00:00"),
    ("2023-02", "2023-02-01T00:00:00+00:00/2023-02-28T23:59:59+00:00"),
    ("2023-01-01T00:00:00Z/2023-12-31T23:59:59Z",
     "2023-01-01T00:00:00+00:00/2023-12-31T23:59:59+00:00"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_reference_table(raw, expected):
    assert normalize(raw) == expected


def test_bare_dotdot_invalid():
    with pytest.raises(DatetimeParseError):
        parse_interval("..")


def test_both_open_invalid():
    with pytest.raises(DatetimeParseError):
        parse_interval("../..")


def test_start_after_end_invalid():
    with pytest.raises(DatetimeParseError):
        parse_interval("2024/2023")


def test_single_rfc3339_degenerate_interval():
    s, e = parse_interval("2024-06-15T12:00:00Z")
    assert s == e and s.year == 2024


def test_permissive_naive_fallback():
    dt = parse_permissively("2023-07-11T12:00:00")
    assert dt.hour == 12 and dt.tzinfo is not None
    dt = parse_permissively("2023-07-11T12:00:00.123")
    assert dt.microsecond == 123000


def test_open_ends():
    s, e = parse_interval("2024-06-01T00:00:00Z/..")
    assert s is not None and e is None
    s, e = parse_interval("../2024-06-01T00:00:00Z")
    assert s is None and e is not None
    # empty string = open (with warning), datetime.rs:62-70
    s, e = parse_interval("2024-06-01T00:00:00Z/")
    assert e is None

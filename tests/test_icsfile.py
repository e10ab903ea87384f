"""Folding/unfolding and RRULE-expansion checks for the iCalendar walk."""

from datetime import datetime

import pytest

from knowledge_extraction_pipeline_spark.sources.icsfile import (
    _fold,
    _unfold,
    build_ics,
    expand_rrule,
    ics_cal_spec,
    parse_ics,
)


def test_fold_unfold_roundtrip():
    long = "SUMMARY:" + "x" * 300
    folded = _fold(long)
    assert all(len(seg.encode()) <= 75 for seg in folded.split("\r\n "))
    assert _unfold((folded + "\r\n").encode().decode()) == [long]


def test_daily_expansion():
    occ = expand_rrule(datetime(2026, 1, 1, 9, 0),
                       {"freq": "DAILY", "interval": 3, "count": 4})
    assert [d.day for d in occ] == [1, 4, 7, 10]


def test_weekly_byday_expansion():
    # 2026-01-01 is a Thursday; MO,WE,FR from there → Jan 2 (Fri),
    # Jan 5 (Mon), Jan 7 (Wed), Jan 9 (Fri), Jan 12 (Mon)
    occ = expand_rrule(datetime(2026, 1, 1, 8, 0),
                       {"freq": "WEEKLY", "byday": "MO,WE,FR",
                        "count": 5})
    assert [d.day for d in occ] == [2, 5, 7, 9, 12]
    # dtstart ON a matching day includes itself
    occ2 = expand_rrule(datetime(2026, 1, 2, 8, 0),
                        {"freq": "WEEKLY", "byday": "FR", "count": 2})
    assert [d.day for d in occ2] == [2, 9]


def test_parse_matches_spec():
    for i in (0, 4, 10):
        spec = ics_cal_spec(i)
        parsed = parse_ics(build_ics(i))
        assert [e["uid"] for e in parsed] == [e["uid"] for e in spec]
        for pe, se in zip(parsed, spec):
            assert pe["occurrences"] == expand_rrule(se["dtstart"],
                                                     se["rule"])
            assert pe["summary"] == se["summary"]


def test_unsupported_shapes_refused():
    with pytest.raises(NotImplementedError):
        expand_rrule(datetime(2026, 1, 1),
                     {"freq": "MONTHLY", "count": 3})
    with pytest.raises(NotImplementedError):
        expand_rrule(datetime(2026, 1, 1),
                     {"freq": "WEEKLY", "byday": "MO", "count": 3,
                      "interval": 2})
    bad = build_ics(0).replace(b"COUNT=", b"UNTIL=20270101T000000Z;X=",
                               1)
    with pytest.raises((NotImplementedError, KeyError, ValueError)):
        parse_ics(bad)

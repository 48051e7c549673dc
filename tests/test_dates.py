import datetime as dt

import pytest

from cdk_datalake_ingest_upeu_spark.functions.dates import (
    MAGIC_OFFSET,
    PartitionPathFormatter,
    date_to_magic,
    delay_window_limits,
    magic_to_date,
)


def test_magic_roundtrip_boundaries():
    # offset anchor: 1900-01-01 <-> 693596 (reference MAGIC_OFFSET)
    assert date_to_magic(dt.date(1900, 1, 1)) == MAGIC_OFFSET
    assert magic_to_date(MAGIC_OFFSET) == dt.date(1900, 1, 1)
    assert magic_to_date(MAGIC_OFFSET + 1) == dt.date(1900, 1, 2)
    # reference doc example: 739062 -> 2024-06-25
    assert magic_to_date(739062) == dt.date(2024, 6, 25)
    assert date_to_magic(dt.date(2024, 6, 25)) == 739062
    # pre-1900
    assert magic_to_date(MAGIC_OFFSET - 1) == dt.date(1899, 12, 31)
    for d in (dt.date(1900, 1, 1), dt.date(2000, 2, 29), dt.date(2099, 12, 31)):
        assert magic_to_date(date_to_magic(d)) == d


def test_delay_window_period():
    now = dt.datetime(2025, 3, 15, 10, 0, 0)
    lo, hi = delay_window_limits("-2", "aje_period", now=now)
    assert (lo, hi) == ("202501", "202503")


def test_delay_window_strips_quotes():
    now = dt.datetime(2025, 3, 15)
    assert delay_window_limits("'-2'", "aje_period", now=now) == ("202501", "202503")


def test_delay_window_magic_dates_snap_to_month_edges():
    now = dt.datetime(2025, 3, 15)
    lo, hi = delay_window_limits("-1", "aje_date", now=now)
    assert magic_to_date(int(lo)) == dt.date(2025, 2, 1)
    assert magic_to_date(int(hi)) == dt.date(2025, 3, 31)


def test_delay_window_month_clamp():
    # Mar 31 minus 1 month must clamp to Feb 28/29
    now = dt.datetime(2025, 3, 31)
    lo, hi = delay_window_limits("-1", "aje_date", now=now)
    assert magic_to_date(int(lo)) == dt.date(2025, 2, 1)


def test_partition_formatter_tokens():
    ts = dt.datetime(2025, 8, 13, 6, 30, 45)
    f = PartitionPathFormatter("year={YYYY}/month={MM}/day={DD}/hour={HH}")
    assert f.format_path(ts) == "year=2025/month=08/day=13/hour=06"
    q = PartitionPathFormatter("q={QUARTER}/w={WEEK}")
    assert q.format_path(ts).startswith("q=Q3/w=")


def test_partition_formatter_rejects_bad_token():
    with pytest.raises(ValueError):
        PartitionPathFormatter("x={NOPE}")


def test_partition_value_extraction():
    vals = PartitionPathFormatter.extract_partition_values(
        "team/src/ep/tbl/year=2025/month=08/day=13/"
    )
    assert vals == {"year": "2025", "month": "08", "day": "13"}


def test_parse_date_process_all_formats():
    from cdk_datalake_ingest_upeu_spark.functions.dates import parse_date_process

    expect = dt.datetime(2025, 10, 17, 14, 30, 0)
    assert parse_date_process("2025-10-17 14:30:00") == expect
    assert parse_date_process("2025-10-17 14:30") == expect
    assert parse_date_process("2025-10-17T14:30:00") == expect
    assert parse_date_process("2025-10-17T14:30:00Z") == expect
    assert parse_date_process("2025-10-17T14:30:00.123456") == expect.replace(
        microsecond=123456
    )
    assert parse_date_process("2025-10-17") == dt.datetime(2025, 10, 17)
    assert parse_date_process("20251017") == dt.datetime(2025, 10, 17)
    assert parse_date_process("20251017143000") == expect
    # invalid / blank -> None (caller falls back to now)
    assert parse_date_process("17/10/2025") is None
    assert parse_date_process("") is None
    assert parse_date_process(None) is None


def test_raw_partition_path_targets_reprocess_date():
    from cdk_datalake_ingest_upeu_spark.functions.dates import raw_partition_path

    p = raw_partition_path(
        "/lake/raw/team/src/ep/tbl",
        "year={YYYY}/month={MM}/day={DD}/hour={HH}",
        date_process="2025-10-17T14:30:00Z",
    )
    assert p == "/lake/raw/team/src/ep/tbl/year=2025/month=10/day=17/hour=14"
    # bad DATE_PROCESS falls back to `now`
    p2 = raw_partition_path(
        "/lake/raw/t", None, date_process="nonsense", now=dt.datetime(2024, 2, 29)
    )
    assert p2 == "/lake/raw/t/year=2024/month=02/day=29"

"""Date/period domain helpers: "magic" dates, delay windows, partition paths.

The reference's domain encodes dates as integers counting days since
1900-01-01 **plus the constant 693596** (Visual-FoxPro-style serial;
``light_transform.py:33-34`` MAGIC_OFFSET, used at ``:904-907``, and
``extract_data_spark.py:404-418`` / ``utils/.../date_utils.py:75-86``).

Delay-window computation turns the table config's
``DELAY_INCREMENTAL_INI`` month offset into (lower, upper) filter
limits rendered per ``FILTER_DATA_TYPE`` — `YYYYMM` period strings,
magic-date ints, or plain dates (``extract_data_spark.py:389-420``).

``PartitionPathFormatter`` renders ``year={YYYY}/month={MM}/...``
templates (token set from ``light_transform.py:1822-1833``).
"""

from __future__ import annotations

import calendar
import datetime as dt
import re

MAGIC_OFFSET = 693596

_TOKENS = {
    "{YYYY}": "%Y",
    "{YY}": "%y",
    "{MM}": "%m",
    "{MON}": "%b",
    "{DD}": "%d",
    "{HH}": "%H",
    "{MI}": "%M",
    "{SS}": "%S",
    "{WEEK}": "%W",
    "{QUARTER}": None,  # rendered as Q1..Q4
}


def date_to_magic(d: dt.date) -> int:
    """date -> magic int (inverse of :func:`magic_to_date`)."""
    return (d - dt.date(1900, 1, 1)).days + MAGIC_OFFSET


def magic_to_date(value: int) -> dt.date:
    """magic int -> date: 1900-01-01 + (value - MAGIC_OFFSET) days."""
    return dt.date(1900, 1, 1) + dt.timedelta(days=value - MAGIC_OFFSET)


def delay_window_limits(
    month_diff: str | int,
    data_type: str,
    *,
    now: dt.datetime | None = None,
) -> tuple[str, str]:
    """(lower, upper) filter limits for a delay window of ``month_diff`` months.

    ``month_diff`` is negative-months-back (e.g. ``"-2"``). Rendering per
    ``data_type`` matches reference ``extract_data_spark.py:389-420``:

    - ``aje_period``        -> ``YYYYMM`` strings
    - ``aje_date`` /
      ``aje_processperiod`` -> magic-date ints as strings, snapped to the
      first day of the lower month and the last day of the upper month
    - anything else         -> ``YYYYMM`` strings
    """
    raw = str(month_diff).strip().replace("'", "")
    months_back = -1 * int(raw)
    upper = now or dt.datetime.now(dt.timezone.utc)
    lower = _minus_months(upper, months_back)
    data_type = (data_type or "").strip()

    if data_type in ("aje_date", "aje_processperiod"):
        _, last_day = calendar.monthrange(upper.year, upper.month)
        upper_snapped = upper.date().replace(day=last_day)
        lower_snapped = lower.date().replace(day=1)
        return str(date_to_magic(lower_snapped)), str(date_to_magic(upper_snapped))

    return lower.strftime("%Y%m"), upper.strftime("%Y%m")


def _minus_months(ts: dt.datetime, months: int) -> dt.datetime:
    """Shift back by calendar months, clamping the day to the month end."""
    total = ts.year * 12 + (ts.month - 1) - months
    year, month = divmod(total, 12)
    month += 1
    day = min(ts.day, calendar.monthrange(year, month)[1])
    return ts.replace(year=year, month=month, day=day)


class PartitionPathFormatter:
    """Renders partition-path templates like ``year={YYYY}/month={MM}/day={DD}``."""

    DEFAULT_FORMAT = "year={YYYY}/month={MM}/day={DD}"

    def __init__(self, template: str | None = None):
        self.template = template or self.DEFAULT_FORMAT
        for token in re.findall(r"\{[^}]+\}", self.template):
            if token not in _TOKENS:
                raise ValueError(f"invalid partition token: {token}")

    def format_path(self, ts: dt.datetime) -> str:
        out = self.template
        for token, fmt in _TOKENS.items():
            if token in out:
                value = f"Q{(ts.month - 1) // 3 + 1}" if token == "{QUARTER}" else ts.strftime(fmt)
                out = out.replace(token, value)
        return out

    @staticmethod
    def extract_partition_values(path: str) -> dict[str, str]:
        return dict(re.findall(r"(\w+)=([^/]+)", path))


# The 8 DATE_PROCESS formats the reference accepts, tried in order
# (``light_transform.py:1641-1651``).
DATE_PROCESS_FORMATS = [
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%d",
    "%Y%m%d",
    "%Y%m%d%H%M%S",
]


def parse_date_process(value: str | None) -> dt.datetime | None:
    """Parse a DATE_PROCESS reprocessing argument against the accepted
    formats (``light_transform.py:1637-1679``). Blank or unparseable
    values return None — the caller falls back to "now", matching the
    reference's warning-and-continue behavior."""
    if not value or not value.strip():
        return None
    text = value.strip()
    for fmt in DATE_PROCESS_FORMATS:
        try:
            return dt.datetime.strptime(text, fmt)
        except ValueError:
            continue
    return None


def raw_partition_path(
    base_dir: str,
    partition_format: str | None,
    *,
    date_process: str | None = None,
    now: dt.datetime | None = None,
) -> str:
    """Raw-zone partition directory for a load: DATE_PROCESS targets a
    past partition for reprocessing, else the current time is used
    (``light_transform.py:1633-1704``). Reading exactly one partition
    directory is what keeps reprocessing O(partition), not O(table)."""
    when = parse_date_process(date_process) or now or dt.datetime.now()
    fmt = partition_format or "year={YYYY}/month={MM}/day={DD}"
    return f"{base_dir.rstrip('/')}/{PartitionPathFormatter(fmt).format_path(when)}"

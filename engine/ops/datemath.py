"""Solr date-math expression parser (upstream
``S/util/DateMathParser.java`` [U]).

Grammar (anchored at ``NOW`` or an ISO instant): a chain of
``/UNIT`` (round down), ``+N UNIT`` and ``-N UNIT`` operations,
evaluated LEFT TO RIGHT — e.g. ``NOW/DAY-7DAYS+12HOURS``. Units
accept the Solr spellings (singular/plural): YEAR(S), MONTH(S),
DAY(S)/DATE, HOUR(S), MINUTE(S), SECOND(S), MILLI(S)/MILLISECOND(S).
Month arithmetic clamps the day-of-month like java.time (Jan 31 +
1MONTH = Feb 28/29).

No clock access: ``now`` is an explicit argument, so results are
deterministic and reproducible (the engine's registry pins it; Solr
pins NOW per-request for the same reason).
"""
from __future__ import annotations

import re
from datetime import datetime, timedelta

_UNIT = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute",
    "SECOND": "second", "SECONDS": "second",
    "MILLI": "milli", "MILLIS": "milli",
    "MILLISECOND": "milli", "MILLISECONDS": "milli",
}

_TOKEN = re.compile(r"/([A-Z]+)|([+-])(\d+)([A-Z]+)")


def _round_down(t: datetime, unit: str) -> datetime:
    if unit == "year":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if unit == "month":
        return t.replace(day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if unit == "day":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return t.replace(second=0, microsecond=0)
    if unit == "second":
        return t.replace(microsecond=0)
    if unit == "milli":
        return t.replace(microsecond=t.microsecond // 1000 * 1000)
    raise ValueError(f"unknown rounding unit {unit!r}")


def _days_in_month(y: int, m: int) -> int:
    if m == 12:
        nxt = datetime(y + 1, 1, 1)
    else:
        nxt = datetime(y, m + 1, 1)
    return (nxt - datetime(y, m, 1)).days


def _add(t: datetime, n: int, unit: str) -> datetime:
    if unit == "year":
        return _add(t, 12 * n, "month")
    if unit == "month":
        total = t.year * 12 + (t.month - 1) + n
        y, m = divmod(total, 12)
        m += 1
        return t.replace(year=y, month=m,
                         day=min(t.day, _days_in_month(y, m)))
    delta = {"day": timedelta(days=n), "hour": timedelta(hours=n),
             "minute": timedelta(minutes=n),
             "second": timedelta(seconds=n),
             "milli": timedelta(milliseconds=n)}[unit]
    return t + delta


def parse(expr: str, now: datetime) -> datetime:
    """Evaluate a Solr date-math expression against a pinned ``now``.

    ``expr`` is either pure math anchored at NOW (``NOW/DAY-7DAYS``)
    or an ISO instant followed by math
    (``2024-01-25T13:47:09Z/HOUR+30MINUTES``).
    """
    expr = expr.strip()
    if expr.startswith("NOW"):
        t, rest = now, expr[3:]
    else:
        # a '-' inside the ISO date is part of the date, not math
        m = re.match(r"\d{4}-\d{2}-\d{2}(T[\d:.]+)?Z?", expr)
        if not m:
            raise ValueError(f"bad date-math anchor in {expr!r}")
        head = m.group(0)
        t = datetime.fromisoformat(head.rstrip("Z"))
        rest = expr[len(head):]
    pos = 0
    for tok in _TOKEN.finditer(rest):
        if tok.start() != pos:
            raise ValueError(f"bad date-math at {rest[pos:]!r}")
        pos = tok.end()
        if tok.group(1):
            unit = _UNIT.get(tok.group(1))
            if unit is None:
                raise ValueError(f"unknown unit {tok.group(1)!r}")
            t = _round_down(t, unit)
        else:
            sign = 1 if tok.group(2) == "+" else -1
            unit = _UNIT.get(tok.group(4))
            if unit is None:
                raise ValueError(f"unknown unit {tok.group(4)!r}")
            t = _add(t, sign * int(tok.group(3)), unit)
    if pos != len(rest):
        raise ValueError(f"trailing garbage in date math: {rest[pos:]!r}")
    return t

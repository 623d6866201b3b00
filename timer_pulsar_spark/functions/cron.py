"""Cron expansion — pure-Python 5-field cron parser + Arrow-batched
pandas UDFs.

Reference parity (file:line into /root/reference):
- `NextsBetween(cron, start, end)` — gotimer_web/pkg/cron/parser.go:40-61.
  The Go loop runs `for start.Before(end)`, appends the strictly-after
  next trigger, then advances the cursor to it. Consequence (§7.5 risk 1
  in SURVEY.md): the returned slice is every trigger in the OPEN interval
  (start, end) **plus the first trigger >= end** — the last element may
  exceed the window. `nexts_between` reproduces that quirk bit-for-bit;
  callers that want a clean half-open window filter afterwards (the
  reference's migrator relies on the quirk to pre-create the first task
  of the next window, worker.go:66-72).
- `IsValidCronExpr` — parser.go:16-19.
- `NextFromNow` — parser.go:21-33 (as `next_after`).

Semantics follow standard 5-field cron (minute hour day-of-month month
day-of-week) as implemented by the public gorhill/cronexpr library the
reference wraps: `*`, lists, ranges, steps, DOW 0 or 7 = Sunday, and the
standard OR rule when both DOM and DOW are restricted. Triggers are at
minute resolution; "strictly after" means the next matching minute
boundary > t.

Scale design: cron evaluation is inherently scalar Python, so it ships
as a *pandas* UDF (Arrow batches, not row-at-a-time pickling), with a
per-batch parse cache — real workloads have a tiny distinct-cron count,
so parsing amortizes to ~zero and the per-row work is pure datetime
arithmetic. The expansion output is `array<timestamp_ntz>` feeding
`explode`, which keeps fan-out narrow (no shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_FIELD_BOUNDS = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]
_MAX_SCAN = 200_000  # safety bound on Next() skip-loop iterations (~4 months of minutes)


@dataclass(frozen=True)
class CronExpr:
    minutes: frozenset
    hours: frozenset
    doms: frozenset
    months: frozenset
    dows: frozenset
    dom_restricted: bool
    dow_restricted: bool


def _parse_field(spec: str, lo: int, hi: int, is_dow: bool) -> tuple[frozenset, bool]:
    if spec == "*":
        return frozenset(range(lo, hi + 1)), False
    vals: set[int] = set()
    for part in spec.split(","):
        if not part:
            raise ValueError("empty list element")
        step = 1
        base = part
        if "/" in part:
            base, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"bad step {step}")
        if base == "*":
            rlo, rhi = lo, hi
        elif "-" in base:
            a, b = base.split("-", 1)
            rlo, rhi = int(a), int(b)
        else:
            rlo = int(base)
            rhi = hi if "/" in part else rlo
        eff_hi = 7 if is_dow else hi  # 7 is an alias for Sunday (0)
        if rlo < lo or rhi > eff_hi or rlo > rhi:
            raise ValueError(f"field out of range: {part}")
        vals.update(range(rlo, rhi + 1, step))
    if is_dow:
        vals = {v % 7 for v in vals}
    return frozenset(vals), True


def parse_cron(expr: str) -> CronExpr:
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"expected 5 fields, got {len(parts)}")
    parsed = []
    for spec, (lo, hi), is_dow in zip(parts, _FIELD_BOUNDS, [False] * 4 + [True]):
        parsed.append(_parse_field(spec, lo, hi, is_dow))
    (mins, _), (hrs, _), (doms, dom_r), (mons, _), (dows, dow_r) = parsed
    return CronExpr(mins, hrs, doms, mons, dows, dom_r, dow_r)


def is_valid(expr: str) -> bool:
    try:
        parse_cron(expr)
        return True
    except (ValueError, AttributeError):
        return False


def _day_matches(c: CronExpr, t: datetime) -> bool:
    dom_ok = t.day in c.doms
    dow_ok = t.isoweekday() % 7 in c.dows  # Monday=1..Sunday=7 -> Sunday=0
    if c.dom_restricted and c.dow_restricted:
        return dom_ok or dow_ok  # standard cron OR rule
    if c.dom_restricted:
        return dom_ok
    if c.dow_restricted:
        return dow_ok
    return True


def next_after(c: CronExpr, t: datetime) -> datetime:
    """Smallest matching minute boundary strictly after t (gorhill
    `expr.Next` semantics at 5-field/minute resolution)."""
    cand = t.replace(second=0, microsecond=0) + timedelta(minutes=1)
    for _ in range(_MAX_SCAN):
        if cand.month not in c.months:
            # jump to the 1st of the next month, 00:00
            y, m = (cand.year + 1, 1) if cand.month == 12 else (cand.year, cand.month + 1)
            cand = cand.replace(year=y, month=m, day=1, hour=0, minute=0)
            continue
        if not _day_matches(c, cand):
            cand = (cand + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if cand.hour not in c.hours:
            cand = (cand.replace(minute=0) + timedelta(hours=1))
            continue
        if cand.minute not in c.minutes:
            cand = cand + timedelta(minutes=1)
            continue
        return cand
    raise ValueError("no matching trigger within scan bound")


def nexts_between(expr: str, start: datetime, end: datetime) -> list[datetime]:
    """All triggers in (start, end) plus the first trigger >= end —
    the reference loop's exact output (parser.go:51-60: append while
    cursor < end, so the last element may exceed end)."""
    if end < start:
        raise ValueError("end can not be earlier than start")
    c = parse_cron(expr)
    out: list[datetime] = []
    cursor = start
    while cursor < end:
        nxt = next_after(c, cursor)
        out.append(nxt)
        cursor = nxt
    return out


# --- Arrow-batched UDFs ----------------------------------------------------


@pandas_udf(T.ArrayType(T.TimestampNTZType()))
def cron_next_times(cron: pd.Series, start: pd.Series, end: pd.Series) -> pd.Series:
    """UDF form of nexts_between; per-batch parse cache so distinct
    crons parse once per Arrow batch."""
    cache: dict[str, CronExpr] = {}

    def one(expr, s, e):
        if expr is None or pd.isna(s) or pd.isna(e):
            return None
        c = cache.get(expr)
        if c is None:
            try:
                c = cache[expr] = parse_cron(expr)
            except ValueError:
                return None
        s = s.to_pydatetime()
        e = e.to_pydatetime()
        if e < s:
            return None
        out, cursor = [], s
        while cursor < e:
            nxt = next_after(c, cursor)
            out.append(nxt)
            cursor = nxt
        return out

    return pd.Series([one(x, s, e) for x, s, e in zip(cron, start, end)], dtype=object)


@pandas_udf(T.BooleanType())
def cron_is_valid(cron: pd.Series) -> pd.Series:
    return cron.map(lambda x: is_valid(x) if x is not None else None)


@pandas_udf(T.TimestampNTZType())
def cron_next_after(cron: pd.Series, t: pd.Series) -> pd.Series:
    """NextFromNow analog (parser.go:21-33) with an explicit 'now'."""
    cache: dict[str, CronExpr] = {}

    def one(expr, ts):
        if expr is None or pd.isna(ts):
            return None
        c = cache.get(expr)
        if c is None:
            try:
                c = cache[expr] = parse_cron(expr)
            except ValueError:
                return None
        return next_after(c, ts.to_pydatetime())

    return pd.Series([one(x, ts) for x, ts in zip(cron, t)], dtype=object)

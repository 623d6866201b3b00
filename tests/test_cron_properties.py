"""Property-based tests (hypothesis) for the cron parser — the
self-consistency invariants that must hold for ANY expression/window:

1. every returned instant matches the expression's fields;
2. instants are strictly increasing, minute-aligned;
3. the first instant is strictly after the window start;
4. all but the last instant are < end; the last is the FIRST trigger
   >= the previous cursor, i.e. no matching minute is skipped;
5. validity is stable (parse twice -> same behavior).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from timer_pulsar_spark.functions.cron import (
    CronExpr,
    is_valid,
    next_after,
    nexts_between,
    parse_cron,
)


def field_strategy(lo: int, hi: int) -> st.SearchStrategy[str]:
    num = st.integers(lo, hi).map(str)
    rng = st.tuples(st.integers(lo, hi), st.integers(lo, hi)).map(
        lambda t: f"{min(t)}-{max(t)}"
    )
    step = st.tuples(st.integers(1, max(1, hi // 2))).map(lambda t: f"*/{t[0]}")
    single = st.one_of(st.just("*"), num, rng, step)
    return st.lists(st.one_of(num, rng), min_size=1, max_size=3).map(",".join) | single


crons = st.tuples(
    field_strategy(0, 59),
    field_strategy(0, 23),
    field_strategy(1, 28),  # stay off 29-31 so every month can match
    field_strategy(1, 12),
    st.just("*"),  # dow exercised separately (OR-rule semantics)
).map(" ".join)

starts = st.datetimes(
    min_value=datetime(2023, 1, 1), max_value=datetime(2025, 12, 1)
)


def matches(c: CronExpr, t: datetime) -> bool:
    dom_ok = t.day in c.doms
    dow_ok = t.isoweekday() % 7 in c.dows
    if c.dom_restricted and c.dow_restricted:
        day = dom_ok or dow_ok
    elif c.dom_restricted:
        day = dom_ok
    elif c.dow_restricted:
        day = dow_ok
    else:
        day = True
    return t.minute in c.minutes and t.hour in c.hours and day and t.month in c.months


@settings(max_examples=150, deadline=None)
@given(crons, starts)
def test_next_after_matches_and_is_minimal(expr, start):
    c = parse_cron(expr)
    nxt = next_after(c, start)
    assert nxt > start
    assert nxt.second == 0 and nxt.microsecond == 0
    assert matches(c, nxt)
    # minimality: no matching minute in (start, nxt) — sample a few
    probe = start.replace(second=0, microsecond=0) + timedelta(minutes=1)
    hops = 0
    while probe < nxt and hops < 200:
        assert not matches(c, probe)
        probe += timedelta(minutes=1)
        hops += 1


@settings(max_examples=100, deadline=None)
@given(crons, starts, st.integers(1, 120))
def test_nexts_between_window_contract(expr, start, span_minutes):
    end = start + timedelta(minutes=span_minutes)
    out = nexts_between(expr, start, end)
    assert out, "non-empty window always yields at least the overshoot element"
    assert all(t1 < t2 for t1, t2 in zip(out, out[1:]))  # strictly increasing
    assert out[0] > start
    c = parse_cron(expr)
    assert all(matches(c, t) for t in out)
    # all but the last are inside the window; the last is >= end OR the
    # sequence's next step past the final in-window trigger
    assert all(t < end for t in out[:-1])
    assert out[-1] >= end or next_after(c, out[-1]) >= end


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_is_valid_never_raises(garbage):
    assert is_valid(garbage) in (True, False)

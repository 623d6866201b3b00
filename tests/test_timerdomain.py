"""Timer-domain tests: pure-Python cron parser semantics (gorhill
NextsBetween parity incl. the boundary quirk), fan-out, idempotent
materialization, and oracle parity for the registered queries."""

from __future__ import annotations

from datetime import datetime

import pytest

from timer_pulsar_spark.functions.cron import (
    is_valid,
    next_after,
    nexts_between,
    parse_cron,
)

from .conftest import SF_DIR, assert_matches_oracle


# --- parser semantics ------------------------------------------------------


def test_next_is_strictly_after():
    c = parse_cron("*/5 * * * *")
    # exactly on a trigger minute -> next trigger, not the same one
    assert next_after(c, datetime(2024, 1, 1, 0, 5, 0)) == datetime(2024, 1, 1, 0, 10)
    assert next_after(c, datetime(2024, 1, 1, 0, 4, 59)) == datetime(2024, 1, 1, 0, 5)


def test_nexts_between_includes_first_trigger_past_end():
    """parser.go:51-60: the loop appends while cursor < end, so the last
    element is the first trigger >= end."""
    out = nexts_between("*/20 * * * *", datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0))
    assert out == [
        datetime(2024, 1, 1, 0, 20),
        datetime(2024, 1, 1, 0, 40),
        datetime(2024, 1, 1, 1, 0),  # == end, still included
    ]
    # trigger far beyond end: loop still runs once and overshoots
    out = nexts_between("0 12 * * *", datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0))
    assert out == [datetime(2024, 1, 1, 12, 0)]


def test_nexts_between_empty_window():
    assert nexts_between("* * * * *", datetime(2024, 1, 1), datetime(2024, 1, 1)) == []
    with pytest.raises(ValueError):
        nexts_between("* * * * *", datetime(2024, 1, 2), datetime(2024, 1, 1))


def test_dom_dow_or_rule():
    # both restricted: fires on the 15th OR on Mondays
    c = parse_cron("0 0 15 * 1")
    # 2024-01-08 is a Monday
    assert next_after(c, datetime(2024, 1, 6, 0, 0)) == datetime(2024, 1, 8, 0, 0)
    # after the Monday, next is the 15th (a Monday as well -> 15th)
    assert next_after(c, datetime(2024, 1, 8, 0, 0)) == datetime(2024, 1, 15, 0, 0)
    # only dow restricted
    c2 = parse_cron("0 0 * * 0")  # Sundays
    assert next_after(c2, datetime(2024, 1, 1, 0, 0)) == datetime(2024, 1, 7, 0, 0)
    # dow 7 == Sunday alias
    c3 = parse_cron("0 0 * * 7")
    assert next_after(c3, datetime(2024, 1, 1, 0, 0)) == datetime(2024, 1, 7, 0, 0)


def test_month_and_range_fields():
    c = parse_cron("30 6 1 3,9 *")
    assert next_after(c, datetime(2024, 1, 1)) == datetime(2024, 3, 1, 6, 30)
    assert next_after(c, datetime(2024, 3, 1, 6, 30)) == datetime(2024, 9, 1, 6, 30)
    c2 = parse_cron("0 9-17/4 * * *")  # 9, 13, 17
    assert next_after(c2, datetime(2024, 1, 1, 9, 0)) == datetime(2024, 1, 1, 13, 0)


def test_validity():
    assert is_valid("* * * * *")
    assert is_valid("*/5 0-23 1,15 * 1-5")
    assert not is_valid("*/0 * * * *")  # zero step
    assert not is_valid("60 * * * *")  # minute out of range
    assert not is_valid("* * * *")  # 4 fields
    assert not is_valid("AFRICA")
    assert not is_valid("a b c d e")


# --- fan-out / materialization over Spark ---------------------------------

ORACLE_CHECKED = ["q_fanout", "q_fanout_daily", "q_cron_valid", "q_materialize"]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, SF_DIR), duck, sql)


def test_merge_upsert_is_idempotent(spark):
    """Re-running materialization must not create duplicate keys (the
    UNIQUE (timer_id, run_timer) contract, task.sql:14)."""
    from timer_pulsar_spark.operators.timerdomain import (
        fan_out,
        merge_upsert,
        minute_timers,
    )

    timers = minute_timers(spark, SF_DIR)
    full = fan_out(timers, "2024-01-01 00:00:00", "2024-01-01 01:00:00")
    once = merge_upsert(full, full, ["timer_id", "run_timer"])
    assert once.count() == full.count()
    assert (
        once.groupBy("timer_id", "run_timer").count().filter("count > 1").count() == 0
    )

"""Time-series operators — the heart of the reference system.

The reference's execution index is a (1-minute window × hash bucket)
partitioning of future tasks (Redis ZSET per slice,
gotimer_web/dao/task/cache.go:47-50), scanned per-second
(gotimer_trigger/service/trigger/worker.go:59-131) and aggregated
per-minute for monitoring (dao/task/sql.go:3). Spark-first equivalents:

- the minute key is `date_trunc`/`date_format` — partition-prunable when
  tables are written partitionBy(minute_bucket);
- the hash bucket is `pmod(key, N)` — a shuffle partitioning, not a
  hand-managed Redis keyspace;
- dynamic bucket scaling (+1 per 200 tasks/min, dao/task/cache.go:33-44)
  is derivable as a column and subsumed at runtime by AQE.

All aggregations here are partial+final hash aggregations (map-side
combine), so the shuffle carries one row per (minute[, bucket]) — at
100 TB the shuffle volume is bounded by the key cardinality, not the
input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_micros, epoch_millis

from ..catalog import load_table


def q_groupby_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-groupby-minute] THE reference aggregation (dao/task/sql.go:3):
    SELECT LEFT(run_timer,16) minute, count(*) cnt FROM task
    WHERE run_timer >= ? AND run_timer < ? GROUP BY LEFT(run_timer,16).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter((F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute"))
        .agg(F.count("*").alias("cnt"))
    )


def q_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-trunc] time truncation to hour buckets (GetStartHour,
    gotimer_web/common/utils/time.go:13-25) + per-hour stats."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-derived] dynamic bucket count: buckets = 10 + floor(cnt/200)
    per minute (gotimer_web/dao/task/cache.go:33-44) — the reference's
    hand-rolled partition-scaling rule as a derived column."""
    per_minute = q_groupby_minute(spark, sf_dir)
    return per_minute.select(
        "minute",
        "cnt",
        (F.lit(10) + F.floor(F.col("cnt") / 200)).cast("long").alias("buckets"),
    )


def q_window_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-bucket]+T6: the full slice partitioning — tumbling 1-minute
    window × pmod hash bucket, i.e. the ZSET key "<minute>_<bucket>"
    (gotimer_web/common/utils/timer.go:43-45, dao/task/cache.go:47-50)
    with per-slice counts."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute"),
            (F.col("user_id") % 10).alias("bucket"),
        )
        .groupBy("minute", "bucket")
        .agg(F.count("*").alias("cnt"))
        .withColumn("slice_key", F.concat_ws("_", "minute", "bucket"))
    )


def q_dedup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-dedup] idempotent-materialization semantics: feed intentional
    duplicate candidates and collapse on the unique key, keeping the
    first-created row (UNIQUE (timer_id, run_timer), task.sql:14;
    MySQL 1062 tolerance, pkg/mysql/mysql.go:54-57).

    The duplicate feed is the events table unioned with itself shifted —
    the min(event_id) per (user_id, minute) survives, exactly MERGE
    WHEN NOT MATCHED semantics. Aggregate form (not dropDuplicates) so
    the winner is deterministic for the oracle.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute")
    )
    dupes = e.unionAll(e)  # at-least-once delivery: every candidate twice
    return dupes.groupBy("user_id", "minute").agg(F.min("event_id").alias("event_id"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization — gap > 30 min starts a new session per user.
    Beyond the reference surface (it has no analytic windows) but a core
    time-series operator for an events table at scale: one shuffle on
    user_id, then lag + running sum inside each partition."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_millis(e, "ts")
    prev_ms = F.lag(ms).over(w)
    gapped = e.withColumn(
        "new_session",
        F.when(
            prev_ms.isNull() | (ms - prev_ms > 1_800_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sessions = gapped.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (day -> hour -> grand total) via GROUP
    BY ROLLUP — the continuous-aggregate/hypertable-rollup shape: one
    pass computes every level with partial aggregation; Catalyst
    expands the grouping sets without rescanning the input. Beyond the
    reference surface (it only has the flat minute count, sql.go:3) but
    the natural upgrade for its monitoring query at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_trunc("day", "ts"))
        .withColumn("hour", F.date_trunc("hour", "ts"))
        .rollup("day", "hour")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (event_type, day-of-week): all four grouping
    sets — per cell, per type, per weekday, grand total — in one pass.
    The grouping-sets expansion happens before the (single) shuffle, so
    the cost is one aggregated scan regardless of how many levels the
    cube has."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("dow", F.dayofweek("ts"))
        .cube("event_type", "dow")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: count events inside derived maintenance
    windows [day r+1, day r+2) built from the region dimension. The
    window side is tiny -> broadcast nested-loop with a range predicate,
    which Spark executes as a broadcast range join (no shuffle of the
    fact side); at 100 TB the fact scan additionally prunes on the
    overall [min_start, max_end) envelope."""
    e = load_table(spark, sf_dir, "events")
    r = load_table(spark, sf_dir, "region")
    windows = r.select(
        F.col("r_regionkey").alias("window_id"),
        F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00' + make_interval(0,0,0,r_regionkey+1)").alias("w_start"),
        F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00' + make_interval(0,0,0,r_regionkey+2)").alias("w_end"),
    )
    return (
        e.join(
            F.broadcast(windows),
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        )
        .groupBy("window_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def q_interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIG-BIG interval overlap join via bucket chunking — the scale
    form q_range_join's broadcast can't cover: when BOTH sides are
    interval tables too large to broadcast, Catalyst's only native
    plan for `a.s <= b.e AND b.s <= a.e` is a nested-loop/cartesian.
    The standard fix (DuckDB's IEJoin or Databricks' range-join
    binning, done here as a pure DataFrame composition): explode every
    interval into the fixed-size TIME BUCKETS it spans (hours), EQUI-
    join on (day, bucket) — a plain shuffle join, partitioned and
    skew-handled like any other — then apply the exact overlap
    predicate and collapse the per-bucket duplicates with one groupBy.
    Join cost is O(sum interval_len / bucket) instead of |A|×|B|;
    bucket width trades explode factor vs candidate precision.

    Workload: pairs of users whose same-day activity intervals
    (first..last event of the day) overlap, with the exact overlap
    window. Deterministic (exact µs timestamps both engines) → full
    oracle, and the plan carries NO BroadcastNestedLoopJoin — gated in
    tests/test_plans.py.

    Bucket width is DATA-ADAPTIVE (one cheap scalar agg): buckets much
    finer than the typical interval only multiply the explode factor
    and the per-pair duplicate candidates without cutting the pair
    space — with day-spanning intervals, hour buckets cost 24× the
    rows for the same candidates (measured 41 s → ~3 s at sf0.1).
    Databricks' range-join hint takes the same `bin size` knob for the
    same reason; here it is derived from the median interval span
    (bucket ≈ span keeps expected buckets/interval ≈ 2)."""
    e = load_table(spark, sf_dir, "events")
    iv = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    med_span_s = (
        iv.select(
            F.median(
                F.unix_micros(F.col("e").cast("timestamp_ltz"))
                - F.unix_micros(F.col("s").cast("timestamp_ltz"))
            ).alias("m")
        ).collect()[0][0]
        or 0
    ) / 1e6
    # snap to the calendar grain at or just below the median span:
    # exact timestamps make any choice correct; this one makes it fast
    bucket = "day" if med_span_s >= 6 * 3600 else (
        "hour" if med_span_s >= 600 else "minute"
    )
    buckets = iv.select(
        "user_id",
        "day",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col("s")),
                F.date_trunc(bucket, F.col("e")),
                F.expr(f"INTERVAL 1 {bucket.upper()}"),
            )
        ).alias("hb"),
    )
    a = buckets.select(
        F.col("user_id").alias("user_a"), "day", "hb",
        F.col("s").alias("s_a"), F.col("e").alias("e_a"),
    )
    b = buckets.select(
        F.col("user_id").alias("user_b"), "day", "hb",
        F.col("s").alias("s_b"), F.col("e").alias("e_b"),
    )
    return (
        a.join(b, ["day", "hb"])
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a"))
        )
        # a pair co-occurs in every shared bucket: one row per pair;
        # day serialized as string so both engines hash identically
        # (a pandas date object vs datetime64 would mismatch on repr)
        .groupBy("user_a", "user_b", "day")
        .agg(
            F.greatest(F.first("s_a"), F.first("s_b")).alias("o_start"),
            F.least(F.first("e_a"), F.first("e_b")).alias("o_end"),
        )
        .select(
            "user_a",
            "user_b",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "o_start",
            "o_end",
        )
    )


def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for each purchase event, the most recent 'error'
    event of the same user at or before it. Spark lacks a native as-of
    join; the scalable composition is a single user-partitioned window
    with the default RANGE frame (unbounded preceding .. current row,
    which includes same-ts peers, so 'at or before' ties resolve
    deterministically): one shuffle on user_id, no self-join, no
    per-row subquery. The same plan shape serves any
    latest-dimension-state-at-event-time lookup at 100 TB."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    last_error = F.max(F.when(F.col("event_type") == "error", F.col("ts"))).over(w)
    return (
        e.withColumn("last_error_ts", last_error)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_error_ts")
    )


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound — pandas merge_asof's
    `tolerance` semantics: the most recent same-user error at or
    before each purchase counts ONLY if it is within 1 hour; older
    state is reported as no-match (NULL) rather than stale data. Same
    single-window plan as q_asof plus one exact integer-microsecond
    comparison; this is the variant real feature pipelines need (a
    features-as-of lookup must not silently serve hours-old state)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    last_error = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))
    ).over(w)
    within = F.expr(
        "timestampdiff(MICROSECOND, last_error_ts, ts) <= 3600000000"
    )
    return (
        e.withColumn("last_error_ts", last_error)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(
                F.col("last_error_ts").isNotNull() & within,
                F.col("last_error_ts"),
            ).alias("recent_error_ts"),
        )
    )


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled minute rollup with last-observation-carried-forward —
    the hypertable `time_bucket_gapfill + locf` analog: a dense minute
    spine (F.sequence over the observed bounds), left-joined to the
    sparse per-minute aggregate, empty minutes carrying the previous
    minute's average forward within each day.

    Scale: the per-minute aggregate is bounded by the time span (not
    the input rows) so both the spine and the rollup are tiny relative
    to the fact table — the join broadcasts. LOCF partitions by day, so
    the window never serializes more than 1440 rows per task no matter
    how long the series grows."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_min = e.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    bounds = per_min.agg(F.min("minute").alias("lo"), F.max("minute").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("minute")
    )
    w = (
        Window.partitionBy(F.to_date("minute"))
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(per_min, "minute", "left")
        .select(
            "minute",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.round(F.last("avg_value", ignorenulls=True).over(w), 6).alias(
                "value_locf"
            ),
        )
        .orderBy("minute")
    )


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled minute rollup with LINEAR INTERPOLATION — the
    hypertable `interpolate()` analog, complementing q_gapfill_locf:
    empty minutes take the value on the straight line between the
    nearest observation before and after (LOCF at the day edges where
    only one side exists). Same bounded shapes as LOCF: the spine and
    rollup are span-sized and the day partition caps every window at
    1440 rows.

    The interpolated series is emitted as an EXACT RATIONAL in integer
    columns — numerator `interp_num` = prev*(next_m - prev_m) +
    (next - prev)*(m - prev_m), denominator `interp_den` = next_m -
    prev_m, value = num/den. All inputs are integers (per-minute event
    counts, integer minute offsets via timestampdiff), so both engines
    produce bit-identical results; a float output would tie-break
    differently per engine whenever a midpoint lands exactly on a
    rounding boundary (each engine rounds doubles by a different rule,
    measured: 8 flipped rows per 43k at 6 decimals)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_min = e.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute")).agg(
        F.count(F.lit(1)).alias("n"),
    )
    bounds = per_min.agg(F.min("minute").alias("lo"), F.max("minute").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("minute")
    )
    day = F.to_date("minute")
    wb = (
        Window.partitionBy(day)
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(day)
        .orderBy("minute")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_minute = F.when(F.col("n").isNotNull(), F.col("minute"))
    joined = (
        spine.join(per_min, "minute", "left")
        .withColumn("prev_val", F.last("n", ignorenulls=True).over(wb))
        .withColumn("prev_min", F.last(obs_minute, ignorenulls=True).over(wb))
        .withColumn("next_val", F.first("n", ignorenulls=True).over(wf))
        .withColumn("next_min", F.first(obs_minute, ignorenulls=True).over(wf))
    )
    dm = F.expr("timestampdiff(MINUTE, prev_min, minute)")
    span = F.expr("timestampdiff(MINUTE, prev_min, next_min)")
    num = (
        F.when(F.col("n").isNotNull(), F.col("n"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val") * span
            + (F.col("next_val") - F.col("prev_val")) * dm
        )
    )
    den = (
        F.when(
            F.col("n").isNotNull()
            | F.col("prev_val").isNull()
            | F.col("next_val").isNull(),
            F.lit(1),
        ).otherwise(span)
    )
    return joined.select(
        "minute",
        num.cast("long").alias("interp_num"),
        den.cast("long").alias("interp_den"),
    ).orderBy("minute")


def q_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event_type — the sketch
    twin of the exact q_distinct: mergeable partial aggregates, fixed
    memory per group regardless of cardinality (the only distinct-count
    that works on a 100 TB hot key).

    The estimate itself is engine-specific, so the ORACLE-checked
    contract is the HLL error bound: the query computes sketch AND
    exact in one plan and returns whether the relative error is within
    5x the configured rsd (deterministic — Spark's HLL++ is
    deterministic given the data). DuckDB's side is the same groups
    with `true`; the raw estimate stays pytest-gated."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.count_distinct("user_id")
            )
            <= 0.10 * F.count_distinct("user_id")
        ).alias("within_bound")
    )


ZORDER_BITS = 16


def zorder_value(x_sql: str, y_sql: str, bits: int = ZORDER_BITS) -> "F.Column":
    """Morton/Z-order value: interleave the low `bits` bits of two
    dimension keys, entirely in one JVM fold expression. Sorting a
    table by this value clusters rows that are close in BOTH
    dimensions into the same parquet row groups, so min/max row-group
    stats prune 2-D range scans — the lakehouse layout trick (Delta
    OPTIMIZE ZORDER BY) expressed as plain columnar math."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> acc"
        f" + shiftleft(({x_sql} >> b) & 1, 2 * b)"
        f" + shiftleft(({y_sql} >> b) & 1, 2 * b + 1))"
    )


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over events: interleave (user_id,
    minute-of-day) — the two dimensions a timer/event workload range-
    scans together (\"this user, this time window\"). The value is
    oracle-checked bit-for-bit; store.write_zordered sorts a table by
    it and the layout test measures the row-group bounding-box
    shrinkage that makes 100 TB scans prune."""
    e = load_table(spark, sf_dir, "events")
    zx = "cast(user_id & 65535 AS BIGINT)"
    zy = "cast((hour(ts) * 60 + minute(ts)) & 65535 AS BIGINT)"
    return e.select(
        "event_id",
        F.expr(zx).alias("zx"),
        F.expr(zy).alias("zy"),
        zorder_value(zx, zy).alias("zval"),
    ).orderBy("event_id")


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE session_window aggregation — the
    built-in operator Spark ships for exactly what q_sessionize builds
    from lag + running sum. The native form is the one to prefer at
    scale: it lowers to a single hash aggregate over merging session
    states (no window-function sort-per-partition), and the SAME
    expression works in Structured Streaming with a watermark (late
    events merge sessions incrementally). Session semantics: an event
    extends its session while it starts strictly before previous-end
    (= last ts + gap); equality starts a new session.

    Returns session bounds (start = first event, end = last event +
    gap) plus per-session aggregates."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — the native F.window with
    a slide: 10-minute windows every 5 minutes, so each event lands in
    exactly two overlapping windows. Catalyst expands the window
    assignment map-side (an Expand of window/slide rows per event)
    before ONE hash aggregate — no self-union, no double scan; the
    same expression runs in Structured Streaming with a watermark.
    Completes the window-aggregation family: tumbling (q_stream_rollup),
    session (q_session_window), hopping (here)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "cnt", "sum_value")
    )


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity OLAP rollup in ONE pass: GROUP BY ROLLUP
    (event_type, event date) emits the per-(type, date) cells, the
    per-type subtotals, and the grand total from a single scan —
    Catalyst lowers it to an Expand (3 grouping-set rows per input
    row, map-side) feeding one partial+final hash aggregate, so the
    corpus is read once however many levels roll up. grouping_id
    disambiguates subtotal NULLs from genuine NULL keys (the classic
    rollup trap); totals are rounded in both engines so float
    summation order cannot flap the hash, and the date key is an ISO
    string (the repo's minute-key convention — engine date dtypes
    disagree on repr)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"), "value"
        )
        .rollup("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.grouping_id().alias("gid"),
        )
        .select("event_type", "d", "n", "sum_value", "gid")
    )


ORACLES: dict[str, str] = {
    "q_rollup_cube": """
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               count(*) AS n,
               round(sum(value), 4) AS sum_value,
               CAST(GROUPING(event_type, strftime(ts, '%Y-%m-%d'))
                    AS BIGINT) AS gid
        FROM events
        GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
    """,
    "q_asof_tolerance": """
        WITH marked AS (
            SELECT event_id, user_id, ts, event_type,
                   max(CASE WHEN event_type = 'error' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_error_ts
            FROM events
        )
        SELECT event_id, user_id, ts,
               CASE WHEN last_error_ts IS NOT NULL
                         AND date_diff('microsecond', last_error_ts, ts)
                             <= 3600000000
                    THEN last_error_ts END AS recent_error_ts
        FROM marked WHERE event_type = 'purchase'
    """,
    "q_hopping_window": """
        SELECT make_timestamp(((epoch_us(ts) - o) // 600000000) * 600000000 + o)
                   AS w_start,
               count(*) AS cnt, round(sum(value), 4) AS sum_value
        FROM events, UNNEST([0::BIGINT, 300000000::BIGINT]) AS t(o)
        GROUP BY 1
    """,
    "q_gapfill_interp": """
        WITH per_min AS (
            SELECT date_trunc('minute', ts) AS minute, count(*) AS n
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), bounds AS (SELECT min(minute) AS lo, max(minute) AS hi FROM per_min),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
            FROM bounds
        ), j AS (
            SELECT s.minute, p.n,
                   last_value(p.n IGNORE NULLS) OVER wb AS prev_val,
                   last_value(CASE WHEN p.n IS NOT NULL THEN s.minute END
                              IGNORE NULLS) OVER wb AS prev_min,
                   first_value(p.n IGNORE NULLS) OVER wf AS next_val,
                   first_value(CASE WHEN p.n IS NOT NULL THEN s.minute END
                               IGNORE NULLS) OVER wf AS next_min
            FROM spine s LEFT JOIN per_min p USING (minute)
            WINDOW wb AS (PARTITION BY CAST(s.minute AS DATE) ORDER BY s.minute
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY CAST(s.minute AS DATE) ORDER BY s.minute
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT minute,
               CAST(CASE WHEN n IS NOT NULL THEN n
                         WHEN prev_val IS NULL THEN next_val
                         WHEN next_val IS NULL THEN prev_val
                         ELSE prev_val * date_diff('minute', prev_min, next_min)
                              + (next_val - prev_val)
                                * date_diff('minute', prev_min, minute)
                    END AS BIGINT) AS interp_num,
               CAST(CASE WHEN n IS NOT NULL OR prev_val IS NULL
                              OR next_val IS NULL THEN 1
                         ELSE date_diff('minute', prev_min, next_min)
                    END AS BIGINT) AS interp_den
        FROM j ORDER BY minute
    """,
    "q_session_window": """
        WITH g AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS ns
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts, value,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seq
            FROM g
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events,
               round(sum(value), 4) AS session_value
        FROM s GROUP BY user_id, seq
    """,
    "q_zorder": f"""
        SELECT event_id,
               user_id & 65535 AS zx,
               (extract(hour FROM ts) * 60 + extract(minute FROM ts)) & 65535
                   AS zy,
               CAST(list_sum(list_transform(range(0, {ZORDER_BITS}),
                   b -> ((((user_id & 65535) >> b) & 1) << (2 * b))
                      + (((((extract(hour FROM ts) * 60
                             + extract(minute FROM ts)) & 65535) >> b) & 1)
                         << (2 * b + 1))
               )) AS BIGINT) AS zval
        FROM events ORDER BY event_id
    """,
    # assertion-form oracle: the deterministic error-bound check must
    # hold for every group (see q_approx_users docstring)
    "q_approx_users": """
        SELECT event_type, true AS within_bound
        FROM events GROUP BY event_type
    """,
    "q_gapfill_locf": """
        WITH per_min AS (
            SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
                   count(*) AS n, round(avg(value), 6) AS avg_value
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), spine AS (
            SELECT unnest(generate_series((SELECT min(minute) FROM per_min),
                                          (SELECT max(minute) FROM per_min),
                                          INTERVAL 1 MINUTE)) AS minute
        )
        SELECT s.minute, CAST(coalesce(p.n, 0) AS BIGINT) AS n,
               round(last_value(p.avg_value IGNORE NULLS) OVER (
                   PARTITION BY CAST(s.minute AS DATE) ORDER BY s.minute
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS value_locf
        FROM spine s LEFT JOIN per_min p USING (minute)
        ORDER BY minute
    """,
    "q_rollup": """
        SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
               count(*) AS cnt, round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
    "q_cube": """
        SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
               count(*) AS cnt, round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY CUBE (event_type, CAST(dayofweek(ts) + 1 AS INTEGER))
    """,
    "q_range_join": """
        SELECT r_regionkey AS window_id, count(*) AS cnt,
               round(sum(value), 4) AS sum_value
        FROM events
        JOIN region
          ON ts >= TIMESTAMP '2024-01-01 00:00:00' + (r_regionkey + 1) * INTERVAL 1 DAY
         AND ts <  TIMESTAMP '2024-01-01 00:00:00' + (r_regionkey + 2) * INTERVAL 1 DAY
        GROUP BY r_regionkey
    """,
    "q_asof": """
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT max(e.ts) FROM events e
                WHERE e.user_id = p.user_id AND e.event_type = 'error'
                  AND e.ts <= p.ts) AS last_error_ts
        FROM events p WHERE p.event_type = 'purchase'
    """,
    # the oracle runs the overlap join DIRECTLY (DuckDB's IEJoin handles
    # the inequality pair natively); the Spark side must produce the
    # identical pair set through the bucketed equi-join plan
    "q_interval_join_bucketed": """
        WITH iv AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   min(ts) AS s, max(ts) AS e
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               strftime(a.day, '%Y-%m-%d') AS day,
               greatest(a.s, b.s) AS o_start,
               least(a.e, b.e) AS o_end
        FROM iv a JOIN iv b
          ON a.day = b.day AND a.user_id < b.user_id
         AND a.s <= b.e AND b.s <= a.e
    """,
    "q_groupby_minute": """
        SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, count(*) AS cnt
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        GROUP BY 1
    """,
    "q_trunc": """
        SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1
    """,
    "q_derived": """
        SELECT minute, cnt, CAST(10 + cnt // 200 AS BIGINT) AS buckets FROM (
            SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, count(*) AS cnt
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
            GROUP BY 1
        )
    """,
    "q_window_bucket": """
        SELECT minute, bucket, count(*) AS cnt, minute || '_' || bucket AS slice_key
        FROM (
            SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, user_id % 10 AS bucket
            FROM events
        )
        GROUP BY minute, bucket
    """,
    "q_dedup_merge": """
        SELECT user_id, minute, min(event_id) AS event_id FROM (
            SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M') AS minute FROM events
            UNION ALL
            SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M') AS minute FROM events
        )
        GROUP BY user_id, minute
    """,
    "q_sessionize": """
        WITH gapped AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, value,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM gapped
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               round(sum(value), 4) AS session_value
        FROM sess GROUP BY user_id, session_seq
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}

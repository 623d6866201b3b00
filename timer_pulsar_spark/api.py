"""Timer lifecycle API (SURVEY.md entry points A and C): create /
enable / unable / delete timer definitions, list with pagination, and
the task-record read path — over the parquet-backed store.

Reference parity (file:line into /root/reference):
- create  -> gotimer_web/service/webserver/timer.go:21-45: validate the
  cron + notify params (vo/timer.go:107-112) before write; unique
  (app, name) (timer.sql:13).
- enable  -> timer.go:83-130 (entry point A): status guard — only an
  Unabled timer can be enabled (timer.go:96-100, P7) — then cron-expand
  to the end of the forward-two migrate windows
  (utils/timer.go:51-54: start-of-hour(now + 2*60min)), fan out task
  rows, insert tolerating duplicates (T14), flip status to Enabled.
- unable  -> timer.go:132-151: inverse guard (must be Enabled).
- list    -> timer.go:153-199 (entry point C): COUNT + paged scan,
  total order by id (the reference re-sorts pages by id client-side,
  timer.go:169-171).
- tasks   -> service/webserver/task.go:30-54: timer_id filter, status
  IN (Running, Successed, Failed), run_timer DESC, paged.

The app-level 3-second rate-limit locks (T15, timer.go:89-94) are an
API-gateway concern, intentionally out of the engine (SURVEY §2.7).

Concurrency note: the reference serializes enable under a row lock
(SELECT FOR UPDATE, dao/timer/timer.go:80-94); here single-writer-per-
table is the contract (Spark job = the writer), and idempotent MERGE
makes retries safe — the same guarantee the lock bought, without a lock
server.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import CONFIG
from .functions.cron import is_valid
from .schemas import (
    TASK_FAILED,
    TASK_NOT_RUNNED,
    TASK_RUNNING,
    TASK_SUCCESSED,
    TIMER,
    TIMER_ENABLED,
    TIMER_UNABLED,
)
from .store import merge_table

MIGRATE_STEP_MINUTES = CONFIG.migrate_step_minutes  # conf/init.go:42-43


def forward_two_step_end(now: datetime) -> datetime:
    """GetForwardTwoMigrateStepEnd (utils/timer.go:51-54): start-of-hour
    of now + 2 migrate steps."""
    return (now + timedelta(minutes=2 * MIGRATE_STEP_MINUTES)).replace(
        minute=0, second=0, microsecond=0
    )


class TimerService:
    """Parquet-backed timer/task tables with the reference's API surface."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.timers_path = os.path.join(root, "timers")
        self.tasks_path = os.path.join(root, "tasks")

    # --- reads ------------------------------------------------------------

    def timers(self) -> DataFrame:
        if not os.path.exists(self.timers_path):
            return self.spark.createDataFrame([], TIMER)
        return self.spark.read.parquet(self.timers_path)

    def tasks(self) -> DataFrame:
        from .streaming.pipeline import TASK_STREAM_SCHEMA

        if not os.path.exists(self.tasks_path):
            return self.spark.createDataFrame([], TASK_STREAM_SCHEMA)
        return self.spark.read.parquet(self.tasks_path)

    def get_timer(self, timer_id: int) -> dict | None:
        rows = self.timers().filter(F.col("id") == timer_id).limit(1).collect()
        return rows[0].asDict(recursive=True) if rows else None

    def list_timers(self, app: str, page: int = 1, size: int = 10) -> DataFrame:
        """Entry point C: total order by id desc, offset/limit page."""
        return (
            self.timers()
            .filter(F.col("app") == app)
            .orderBy(F.col("id").desc())
            .offset((page - 1) * size)
            .limit(size)
        )

    def find_timers(self, app: str, name_fuzzy: str, page: int = 1, size: int = 10) -> DataFrame:
        """GetTimersByName (timer.go:177-199): LIKE '%fuzzy%' search,
        same total order and paging as list_timers."""
        return (
            self.timers()
            .filter(F.col("app") == app)
            .filter(F.col("name").like(f"%{name_fuzzy}%"))
            .orderBy(F.col("id").desc())
            .offset((page - 1) * size)
            .limit(size)
        )

    def list_tasks(self, timer_id: int, page: int = 1, size: int = 10) -> DataFrame:
        """task.go:30-54: visible statuses only, newest first."""
        return (
            self.tasks()
            .filter(F.col("timer_id") == timer_id)
            .filter(F.col("status").isin(TASK_RUNNING, TASK_SUCCESSED, TASK_FAILED))
            .orderBy(F.col("run_timer").desc())
            .offset((page - 1) * size)
            .limit(size)
        )

    # --- writes -----------------------------------------------------------

    def create_timer(
        self,
        timer_id: int,
        app: str,
        name: str,
        cron: str,
        notify_http_param: dict,
        created_at: datetime,
    ) -> None:
        """Validated insert; (app, name) unique -> duplicate creates are
        no-ops (MERGE WHEN NOT MATCHED)."""
        if not is_valid(cron):
            raise ValueError(f"invalid cron expression: {cron!r}")
        for field in ("method", "url"):
            if not notify_http_param.get(field):
                raise ValueError(f"notify_http_param.{field} is required")
        row = {
            "id": timer_id,
            "app": app,
            "name": name,
            "status": TIMER_UNABLED,
            "cron": cron,
            "notify_http_param": notify_http_param,
            "created_at": created_at,
            "updated_at": created_at,
            "deleted_at": None,
        }
        df = self.spark.createDataFrame([row], TIMER)
        merge_table(self.spark, self.timers_path, df, ["app", "name"])

    def _set_status(self, timer_id: int, expect: int, to: int, now: datetime) -> None:
        cur = self.get_timer(timer_id)
        if cur is None:
            raise ValueError(f"timer {timer_id} not found")
        if cur["status"] != expect:  # P7 guard (timer.go:96-100)
            raise ValueError(
                f"illegal status transition for timer {timer_id}: "
                f"{cur['status']} -> {to} (expected current {expect})"
            )
        updated = (
            self.timers()
            .filter(F.col("id") == timer_id)
            .withColumn("status", F.lit(to))
            .withColumn("updated_at", F.lit(now))
        )
        merge_table(self.spark, self.timers_path, updated, ["id"], update_matched=True)

    def enable_timer(self, timer_id: int, now: datetime) -> int:
        """Entry point A: guard -> fan out [now, end-of-two-windows) ->
        idempotent task insert -> status Enabled. Returns the number of
        materialized instants. Retry-safe end to end."""
        from .operators.timerdomain import fan_out

        cur = self.get_timer(timer_id)
        if cur is None:
            raise ValueError(f"timer {timer_id} not found")
        if cur["status"] != TIMER_UNABLED:
            raise ValueError(f"timer {timer_id} is not in Unabled state")

        timer_df = (
            self.timers()
            .filter(F.col("id") == timer_id)
            .select(F.col("id").alias("timer_id"), "cron")
        )
        end = forward_two_step_end(now)
        tasks = fan_out(
            timer_df, now.strftime("%Y-%m-%d %H:%M:%S"), end.strftime("%Y-%m-%d %H:%M:%S")
        )
        n = tasks.count()
        merge_table(self.spark, self.tasks_path, tasks, ["timer_id", "run_timer"])
        self._set_status(timer_id, TIMER_UNABLED, TIMER_ENABLED, now)
        return n

    def run_migration(self, now: datetime) -> int:
        """T9: the periodic migrator (service/migrator/worker.go:54-76)
        as one batch job — every Enabled timer, cron-expanded over the
        next window [start-of-hour(now + step), start-of-hour(now +
        2*step)), idempotently MERGEd into the tasks table. The
        reference loops timers one by one with a sleep (worker.go:73);
        here the whole fleet expands in one distributed fan-out.
        Re-running for the same hour is a no-op (the migrator lock's
        job, subsumed by MERGE). Returns rows in the window."""
        from .operators.timerdomain import fan_out

        step = timedelta(minutes=MIGRATE_STEP_MINUTES)
        start = (now + step).replace(minute=0, second=0, microsecond=0)
        end = (now + 2 * step).replace(minute=0, second=0, microsecond=0)
        enabled = (
            self.timers()
            .filter(F.col("status") == TIMER_ENABLED)
            .filter(F.col("deleted_at").isNull())
            .select(F.col("id").alias("timer_id"), "cron")
        )
        tasks = fan_out(
            enabled, start.strftime("%Y-%m-%d %H:%M:%S"), end.strftime("%Y-%m-%d %H:%M:%S")
        )
        n = tasks.count()
        if n:
            merge_table(self.spark, self.tasks_path, tasks, ["timer_id", "run_timer"])
        return n

    def unable_timer(self, timer_id: int, now: datetime) -> None:
        """timer.go:132-151: Enabled -> Unabled. Pending NotRunned tasks
        stay but will not fire (the pipeline's fire-time enabled check,
        T16)."""
        self._set_status(timer_id, TIMER_ENABLED, TIMER_UNABLED, now)

    def delete_timer(self, timer_id: int, now: datetime) -> None:
        """gorm soft delete (po/timer.go:12): set deleted_at, keep the row."""
        updated = (
            self.timers()
            .filter(F.col("id") == timer_id)
            .withColumn("deleted_at", F.lit(now))
            .withColumn("updated_at", F.lit(now))
        )
        merge_table(self.spark, self.timers_path, updated, ["id"], update_matched=True)

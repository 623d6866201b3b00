"""Metrics (S13, A5, A6): counters, gauges, and delay quantiles.

Reference parity (file:line into /root/reference):
- exec counters / enabled-timer gauges ->
  gotimer_web/pkg/promethus/reporter.go:112-126.
- delay summary quantiles {.5,.9,.99,.999,.9999} of (actual-scheduled)
  ms -> reporter.go:74-83; recorded by the executor, woker.go:133-136.

Spark-first: metrics ride the query itself via `df.observe()` — the
aggregates are computed inside the same job (map-side, no extra scan)
and surface through `Observation` (batch) or
`StreamingQueryListener.onQueryProgress` (streaming). The quantile
gauge uses approx_percentile, a mergeable sketch, because buffering
exact per-group values is the one thing that cannot scale to 100 TB.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

DELAY_QUANTILES = [0.5, 0.9, 0.99, 0.999, 0.9999]  # reporter.go:74-83


def observe_exec_metrics(
    df: DataFrame, name: str = "exec", *, with_delay_summary: bool = False
) -> tuple[DataFrame, Observation]:
    """Attach the executor's counter/gauge set to a status DataFrame
    (columns: status, cost_time[, delay_ms]). Read obs.get AFTER an
    action. With ``with_delay_summary`` the delay quantiles ride the
    SAME job as a mergeable approx_percentile aggregate — no extra scan
    (reporter.go's summary is client-side; here the sketch merges across
    executors). Off by default: the sketch costs a few ms per
    micro-batch, which matters at a 1-second trigger, so the pipeline
    enables it only when a metrics registry is actually wired."""
    obs = Observation(name)
    aggs = [
        F.count(F.lit(1)).alias("exec_total"),
        F.sum((F.col("status") == 2).cast("long")).alias("exec_success"),
        F.sum((F.col("status") == 3).cast("long")).alias("exec_failed"),
        F.avg("cost_time").alias("cost_ms_avg"),
        F.max("cost_time").alias("cost_ms_max"),
    ]
    if with_delay_summary and "delay_ms" in df.columns:
        pcts = ", ".join(str(q) for q in DELAY_QUANTILES)
        aggs.append(
            F.expr(f"approx_percentile(delay_ms, array({pcts}))").alias("delay_pcts")
        )
        aggs.append(F.sum("delay_ms").alias("delay_sum"))
    observed = df.observe(obs, *aggs)
    return observed, obs


# ---------------------------------------------------------------------------
# S13 exposition surface: the reference serves its collectors at /metrics
# (app/webserver/app.go:97-101, promauto collectors reporter.go:60-110).
# The engine's analog: a driver-side registry fed by per-batch
# Observation results, exposed in the Prometheus text format 0.0.4 by a
# stdlib HTTP server. Scale note: only BATCH AGGREGATES cross from the
# executors (one observe row per micro-batch) — the registry never sees
# per-task rows, so the exposition cost is O(metric names), not O(tasks).
# ---------------------------------------------------------------------------


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


class MetricsRegistry:
    """Counter/gauge/summary registry mirroring the reference's four
    collectors (reporter.go:19-41): timer_exec_total_cnt (counter),
    timer_delay_cnt (summary at {.5,.9,.99,.999,.9999}),
    timer_enabled_cnt / timer_unexeced_cnt (gauges)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple[str, tuple], float] = {}
        self._gauges: dict[tuple[str, tuple], float] = {}
        # name+labels -> (quantile->value, count, sum)
        self._summaries: dict[tuple[str, tuple], tuple[dict, float, float]] = {}

    @staticmethod
    def _key(name: str, labels: dict[str, str]) -> tuple[str, tuple]:
        return name, tuple(sorted(labels.items()))

    def inc(self, name: str, value: float = 1.0, **labels: str) -> None:
        k = self._key(name, labels)
        with self._lock:
            self._counters[k] = self._counters.get(k, 0.0) + value

    def set_gauge(self, name: str, value: float, **labels: str) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def set_summary(
        self,
        name: str,
        quantile_values: dict[float, float],
        count: float,
        total: float,
        **labels: str,
    ) -> None:
        """Record a sketch-derived summary snapshot (quantiles merged
        executor-side by approx_percentile; count/sum accumulate)."""
        k = self._key(name, labels)
        with self._lock:
            _, prev_n, prev_sum = self._summaries.get(k, ({}, 0.0, 0.0))
            self._summaries[k] = (dict(quantile_values), prev_n + count, prev_sum + total)

    def record_exec_batch(self, metrics_row: dict, app: str = "timer_pulsar_spark") -> None:
        """Fold one micro-batch's Observation row into the collectors
        (the per-batch analog of ReportExecRecord/ReportTimerDelayRecord,
        reporter.go:112-121)."""
        n = metrics_row.get("exec_total") or 0
        if not n:
            return
        self.inc("timer_exec_total_cnt", float(n), xtimerApp=app)
        self.inc("timer_exec_success_cnt", float(metrics_row.get("exec_success") or 0), xtimerApp=app)
        self.inc("timer_exec_failed_cnt", float(metrics_row.get("exec_failed") or 0), xtimerApp=app)
        pcts = metrics_row.get("delay_pcts")
        if pcts is not None:
            self.set_summary(
                "timer_delay_cnt",
                dict(zip(DELAY_QUANTILES, pcts)),
                float(n),
                float(metrics_row.get("delay_sum") or 0),
                xtimerApp=app,
            )

    def record_state_drift(self, root: str, drift: dict) -> None:
        """Expose a fold-state root's reshard-drift signal
        (streaming.state.observe_drift) as gauges (VERDICT r11 #8): the
        signal was bench-measured but invisible during a real run — an
        operator had to run the bench harness to see whether the
        sizing law had outgrown the pinned n_parts. Labeled by the
        root's basename so several fold states coexist in one
        exposition."""
        import os

        label = os.path.basename(root.rstrip("/")) or root
        self.set_gauge(
            "fold_state_bytes", float(drift["state_bytes"]), state=label
        )
        self.set_gauge(
            "fold_state_n_parts", float(drift["n_parts"]), state=label
        )
        self.set_gauge(
            "fold_state_suggested_n_parts",
            float(drift["suggested_n_parts"]),
            state=label,
        )
        self.set_gauge(
            "fold_state_reshard_due",
            1.0 if drift["reshard_due"] else 0.0,
            state=label,
        )

    def render(self) -> str:
        """Prometheus text exposition format 0.0.4."""
        lines: list[str] = []
        with self._lock:
            seen: set[str] = set()
            for (name, labels), v in sorted(self._counters.items()):
                if name not in seen:
                    lines.append(f"# TYPE {name} counter")
                    seen.add(name)
                lines.append(f"{name}{_fmt_labels(dict(labels))} {v:g}")
            for (name, labels), v in sorted(self._gauges.items()):
                if name not in seen:
                    lines.append(f"# TYPE {name} gauge")
                    seen.add(name)
                lines.append(f"{name}{_fmt_labels(dict(labels))} {v:g}")
            for (name, labels), (qv, n, total) in sorted(self._summaries.items()):
                if name not in seen:
                    lines.append(f"# TYPE {name} summary")
                    seen.add(name)
                for q, val in sorted(qv.items()):
                    ql = dict(labels) | {"quantile": f"{q:g}"}
                    lines.append(f"{name}{_fmt_labels(ql)} {val:g}")
                lines.append(f"{name}_sum{_fmt_labels(dict(labels))} {total:g}")
                lines.append(f"{name}_count{_fmt_labels(dict(labels))} {n:g}")
        return "\n".join(lines) + "\n"


def serve_metrics(registry: MetricsRegistry, port: int = 0, host: str = "127.0.0.1"):
    """Serve the registry at /metrics (app.go:97-101 analog) on a
    daemon thread. Returns the server; `server.server_address[1]` is the
    bound port (port=0 -> ephemeral), `server.shutdown()` stops it."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path.split("?")[0].rstrip("/") not in ("", "/metrics"):
                self.send_error(404)
                return
            body = registry.render().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            return

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def delay_quantiles(df: DataFrame, delay_col: str = "delay_ms") -> DataFrame:
    """The delay SLO summary (p99 <= 1s design point, BASELINE.md):
    approx_percentile sketch over (actual - scheduled) ms."""
    pcts = ", ".join(str(q) for q in DELAY_QUANTILES)
    return df.agg(
        F.expr(f"approx_percentile({delay_col}, array({pcts}))").alias("delay_quantiles"),
        F.count(F.lit(1)).alias("n"),
    )


def q_metrics_summary(spark, sf_dir: str) -> DataFrame:
    """[A5] counter/gauge aggregation surface over events: exec-total
    analog per type plus exact value stats (oracle-checkable; the
    sketch-based quantile twin is q_quantile_approx)."""
    from .catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("exec_total"),
        F.round(F.avg("value"), 6).alias("value_avg"),
        F.round(F.max("value"), 4).alias("value_max"),
        F.round(F.min("value"), 4).alias("value_min"),
    )


ORACLES: dict[str, str] = {
    "q_metrics_summary": """
        SELECT event_type, count(*) AS exec_total,
               round(avg(value), 6) AS value_avg,
               round(max(value), 4) AS value_max,
               round(min(value), 4) AS value_min
        FROM events GROUP BY event_type
    """,
}

QUERIES = {"q_metrics_summary": q_metrics_summary}

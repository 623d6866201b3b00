"""Engine configuration (S14) — the reference's viper-YAML config
surface (gotimer_web/common/conf/init.go:8-98) as one frozen dataclass,
with the SAME default values, overridable via environment variables
(`TIMERLAKE_<FIELD>`).

| field | reference key | source |
|---|---|---|
| buckets_num | scheduler.bucketsNum (10) | conf/init.go:54-55 |
| bucket_scale_rows | +1 bucket per 200 tasks/min | dao/task/cache.go:39 |
| migrate_step_minutes | migrator.migrateStepMinutes (60) | conf/init.go:42-43 |
| trigger_gap_seconds | trigger.zrangeGapSeconds (1) | conf/init.go:64-67 |
| scheduler_poll_ms | scheduler.tryLockGapMilliSeconds (100) | conf/init.go:58-59 |
| http_timeout_seconds | xhttp timeout (5 s) | pkg/xhttp/client.go:15 |
| http_max_response_bytes | xhttp cap (4 MB) | pkg/xhttp/client.go:17 |
| timer_detail_cache_minutes | migrator.timerDetailCacheMinutes (2) | conf/init.go:48 |
| default_page_size | PageLimiter default (10) | vo/base.go:39-47 |
| watermark_lateness | 1-minute replay horizon | scheduler/worker.go:110-123 |

Lock TTLs, goroutine pool sizes, and connection pools have no engine
analog (Spark checkpointing/task scheduling subsumes them, SURVEY §4)
and are intentionally absent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


@dataclass(frozen=True)
class EngineConfig:
    buckets_num: int = 10
    bucket_scale_rows: int = 200
    migrate_step_minutes: int = 60
    trigger_gap_seconds: int = 1
    scheduler_poll_ms: int = 100
    http_timeout_seconds: int = 5
    http_max_response_bytes: int = 4 * 1024 * 1024
    timer_detail_cache_minutes: int = 2
    default_page_size: int = 10
    watermark_lateness: str = "1 minute"

    @classmethod
    def from_env(cls) -> "EngineConfig":
        kwargs = {}
        for f in fields(cls):
            raw = os.environ.get(f"TIMERLAKE_{f.name.upper()}")
            if raw is not None:
                kwargs[f.name] = type(f.default)(raw)
        return cls(**kwargs)


CONFIG = EngineConfig.from_env()

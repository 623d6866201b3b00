"""Explicit StructType schemas — the engine never infers.

The reference declares every schema twice (DDL in common/model/sql/*.sql
and GORM structs in common/model/po/*.go); the engine's single source of
truth is this module.

Domain tables mirror the reference data model
(gotimer_executor/common/model/sql/timer.sql:1-14, task.sql:1-16);
testdata tables mirror TESTDATA.md / FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- domain: timer definitions (timer.sql:1-14, po/timer.go:11-18) -------

# notify_http_param is a JSON column in the reference
# (vo/timer.go:18-23 NotifyHTTPParam{Method, URL, Header, Body});
# natively a struct here, (de)serialized with to_json/from_json at the edge.
NOTIFY_HTTP_PARAM = T.StructType(
    [
        T.StructField("method", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("header", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("body", T.StringType(), True),
    ]
)

TIMER = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("app", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),  # 1=Unabled 2=Enabled (consts/timer.go:30-31)
        T.StructField("cron", T.StringType(), False),
        T.StructField("notify_http_param", NOTIFY_HTTP_PARAM, True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("deleted_at", T.TimestampType(), True),  # gorm soft delete
    ]
)

# --- domain: task run-log (task.sql:1-16, po/task.go:10-18) ---------------
# unique (timer_id, run_timer) is the idempotency/MERGE key (task.sql:14).

TASK = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("app", T.StringType(), True),
        T.StructField("timer_id", T.LongType(), False),
        T.StructField("run_timer", T.TimestampType(), False),
        T.StructField("status", T.IntegerType(), False),  # 0 NotRunned 1 Running 2 Successed 3 Failed
        T.StructField("output", T.StringType(), True),
        T.StructField("cost_time", T.IntegerType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("deleted_at", T.TimestampType(), True),
    ]
)

# status enums (gotimer_web/common/consts/timer.go:24-32)
TIMER_UNABLED, TIMER_ENABLED = 1, 2
TASK_NOT_RUNNED, TASK_RUNNING, TASK_SUCCESSED, TASK_FAILED = 0, 1, 2, 3

# --- driver testdata tables (TESTDATA.md) ---------------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA)

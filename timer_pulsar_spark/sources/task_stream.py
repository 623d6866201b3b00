"""Due-task stream source/sink factory (SURVEY.md S10/S11).

The reference moves due tasks over two Pulsar topic hops
(gotimer_web/service/scheduler -> topic -> gotimer_trigger -> topic ->
executor; consume-after-complete ack in gotimer_trigger/main.go:117-123).
In the Spark engine the pipeline is ONE streaming query, so the hops
collapse to a single *source* (and optionally a *sink* feeding an
external consumer); Spark's checkpoint subsumes the ack.

`task_stream` returns the same-schema stream from any of:
- ``files``  — parquet directory (hermetic; tests and the driver gate);
- ``kafka`` / ``pulsar`` — the respective Structured Streaming
  connector, JSON task records in ``value``. The connector jar ships
  with the cluster (``--packages org.apache.spark:spark-sql-kafka-0-10``
  or StreamNative's pulsar-spark connector); this module only maps
  options and decodes records, so it imports and plans without the jar
  — ``.load()`` raises only when the format is genuinely unavailable.

The record codec is factored out (`decode_task_records` /
`encode_task_records`) so its schema mapping is testable on plain batch
DataFrames without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical due-task record (matches streaming/pipeline.TASK_STREAM_SCHEMA)
TASK_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("timer_id", T.LongType(), False),
        T.StructField("run_timer", T.TimestampType(), False),
        T.StructField("status", T.IntegerType(), True),
    ]
)


def decode_task_records(records: DataFrame) -> DataFrame:
    """broker record (key/value binary) -> task columns. Works on batch
    and streaming DataFrames alike (pure projection)."""
    return records.select(
        F.from_json(F.col("value").cast("string"), TASK_RECORD_SCHEMA).alias("t")
    ).select("t.*")


def encode_task_records(tasks: DataFrame) -> DataFrame:
    """task columns -> broker record: key = timer_id (keeps one timer's
    tasks in one topic partition — ordered per timer, like the
    reference's per-slice ZSET), value = JSON."""
    return tasks.select(
        F.col("timer_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("timer_id", "run_timer", "status")).cast("binary").alias("value"),
    )


def task_stream(
    spark: SparkSession,
    kind: str = "files",
    *,
    path: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S11: the due-task stream, any transport, one schema."""
    if kind == "files":
        if path is None:
            raise ValueError("files source requires path=")
        return spark.readStream.schema(TASK_RECORD_SCHEMA).parquet(path)
    if kind in ("kafka", "pulsar"):
        reader = spark.readStream.format(kind)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return decode_task_records(reader.load())
    if kind == "fake_kafka":
        # in-process broker with the real consumer protocol shape
        # (offset ranges, partition assignment, group commit = ack) —
        # see sources/fake_broker.py; same decode path as kafka/pulsar
        if path is None:
            raise ValueError("fake_kafka source requires path=")
        from .fake_broker import register

        register(spark)
        reader = spark.readStream.format("fake_kafka").option("path", path)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return decode_task_records(reader.load())
    if kind == "records":
        # broker loopback: a directory of (key,value binary) records in
        # EXACTLY the kafka/pulsar wire shape, run through the same
        # decode path the real connectors use — the hermetic stand-in
        # that exercises the codec->connector seam end-to-end without a
        # broker process (tests/test_streaming.py drives the full
        # pipeline through it)
        if path is None:
            raise ValueError("records source requires path=")
        records = spark.readStream.schema("key binary, value binary").parquet(path)
        return decode_task_records(records)
    raise ValueError(f"unknown task stream kind: {kind!r}")


def task_sink(tasks_stream: DataFrame, kind: str, *, path: str | None = None,
              checkpoint: str | None = None, options: dict[str, str] | None = None):
    """S10: produce due tasks for an external consumer. Returns the
    started StreamingQuery."""
    if kind == "files":
        writer = tasks_stream.writeStream.format("parquet").option("path", path)
    elif kind == "fake_kafka":
        # protocol-level produce seam: records land in the fake broker's
        # partitioned logs with per-batch producer idempotency
        from .fake_broker import register

        register(tasks_stream.sparkSession)
        writer = (
            encode_task_records(tasks_stream)
            .writeStream.format("fake_kafka")
            .option("path", path)
        )
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
    elif kind in ("kafka", "pulsar"):
        writer = encode_task_records(tasks_stream).writeStream.format(kind)
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
    else:
        raise ValueError(f"unknown task sink kind: {kind!r}")
    return writer.option("checkpointLocation", checkpoint).start()

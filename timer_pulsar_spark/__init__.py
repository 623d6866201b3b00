"""timer_pulsar_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``timer-pulsar`` reference system.

The reference (read-only at /root/reference) is a Go distributed
cron-timer / delayed-task pipeline (web + scheduler + trigger + executor
microservices over MySQL/Redis/Pulsar).  This package re-expresses its
entire query surface Spark-first:

- the relational read path (filtered/paginated scans, point lookups,
  IN/LIKE filters, counts, group-by-minute aggregation, broadcast joins)
  as declarative DataFrame plans -> ``operators/relational.py``,
  ``operators/timeseries.py``
- the timer domain (cron expansion, task fan-out, idempotent
  materialization, status state machine, timer CRUD) ->
  ``functions/cron.py``, ``operators/timerdomain.py``, ``api.py``
- the write path (batch append, slice-partitioned task store, parquet
  MERGE upsert/update) -> ``store.py``
- the execution pipeline (scheduler/trigger/executor loop) as Structured
  Streaming micro-batches with an injectable HTTP executor ->
  ``streaming/pipeline.py``, ``streaming/notify.py``
- metrics (observe()-based counters/gauges, delay-quantile sketches) ->
  ``metrics.py``; reference bloom-hash parity -> ``functions/hashing.py``
- large-scale training-data-pipeline extensions (dedup, similarity
  search, text analysis, multimodal plumbing) -> ``operators/dedup.py``,
  ``operators/similarity.py``, ``operators/textops.py``,
  ``operators/multimodal.py``

Everything is built on public Apache Spark APIs; no code is copied from
the reference.
"""

__version__ = "0.1.0"

"""In-process fake broker with the Kafka protocol SHAPE (SURVEY S10/S11
beyond the codec loopback): partitioned append-only logs, key-hash
partition assignment, offset-range consumption, and consumer-group
commit — wired into Structured Streaming as a Python DataSource
(`spark.readStream.format("fake_kafka")`), so the pipeline exercises
the REAL connector seam: initialOffset → latestOffset → partitions →
read → commit, with Spark's checkpoint driving redelivery exactly like
a broker restart would.

Reference parity (file:line into /root/reference):
- consume-after-complete ack (gotimer_trigger/main.go:117-123;
  gotimer_executor/mq/client.go:20-50): `commit()` is called by the
  engine only AFTER the micro-batch that read those offsets has
  durably completed — the consumer-group offset file advances to the
  batch end, which the tests assert (the ack-follows-effect contract).
- per-key ordering (one timer's tasks in one partition): the producer
  assigns partition = hash(key) % n_partitions, the Kafka
  DefaultPartitioner analog of the reference's `timer_id % BucketsNum`
  slice routing (dao/task/cache.go:47-50).

Storage layout (all under a root directory):
    p=<i>/log.jsonl      append-only records {offset, key, value} (b64)
    groups/<group>.json  committed consumer offsets {partition: next}

The broker is NOT a performance component — it is the hermetic
protocol twin the sandbox's lack of a real broker requires; a real
deployment swaps format("fake_kafka") for format("kafka") with the
same downstream plan (sources/task_stream.py maps both).
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_PARTITIONS = 4


def _plog(root: str, pid: int) -> str:
    return os.path.join(root, f"p={pid}", "log.jsonl")


class FakeBroker:
    """Driver-side handle: topic admin + producer + offset inspection."""

    def __init__(self, root: str, n_partitions: int = DEFAULT_PARTITIONS):
        self.root = root
        self.n_partitions = n_partitions
        for pid in range(n_partitions):
            os.makedirs(os.path.join(root, f"p={pid}"), exist_ok=True)
        os.makedirs(os.path.join(root, "groups"), exist_ok=True)

    def produce(self, records: list[tuple[bytes, bytes]]) -> None:
        """Append (key, value) records; partition = hash(key) % n —
        per-key ordering, the Kafka DefaultPartitioner analog."""
        by_pid: dict[int, list[tuple[bytes, bytes]]] = {}
        for key, value in records:
            pid = int.from_bytes(
                __import__("hashlib").md5(key).digest()[:4], "big"
            ) % self.n_partitions
            by_pid.setdefault(pid, []).append((key, value))
        for pid, recs in by_pid.items():
            path = _plog(self.root, pid)
            next_off = self._log_len(pid)
            with open(path, "a") as f:
                for key, value in recs:
                    f.write(
                        json.dumps(
                            {
                                "offset": next_off,
                                "key": base64.b64encode(key).decode(),
                                "value": base64.b64encode(value).decode(),
                            }
                        )
                        + "\n"
                    )
                    next_off += 1

    def _log_len(self, pid: int) -> int:
        path = _plog(self.root, pid)
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return sum(1 for _ in f)

    def end_offsets(self) -> dict[str, int]:
        return {str(p): self._log_len(p) for p in range(self.n_partitions)}

    def committed(self, group: str = "spark") -> dict[str, int]:
        path = os.path.join(self.root, "groups", f"{group}.json")
        if not os.path.exists(path):
            return {str(p): 0 for p in range(self.n_partitions)}
        with open(path) as f:
            return json.load(f)


@dataclass
class _OffsetRange(InputPartition):
    pid: int
    start: int
    end: int
    root: str


class FakeKafkaStreamReader(DataSourceStreamReader):
    """The consumer half of the protocol. Offsets are dicts
    {partition: next_offset_to_read} — the exact shape the Kafka
    connector checkpoints.

    GROUP MEMBERSHIP (the reference's shared subscription,
    gotimer_trigger/main.go:110-124): ``memberId``/``groupSize``
    options give STATIC partition assignment — member m of M owns
    exactly the partitions p with p % M == m (Kafka's
    group.instance.id static-membership analog; range/sticky
    assignment converges to the same exclusivity). A member reads,
    reports, and commits ONLY its own partitions, and the group
    offset file is merged per-partition under a file lock, so two
    concurrent queries in one group consume disjoint partitions and
    their acks never clobber each other."""

    def __init__(
        self,
        root: str,
        group: str,
        n_partitions: int,
        member_id: int = 0,
        group_size: int = 1,
    ):
        if not (0 <= member_id < group_size):
            raise ValueError(
                f"memberId {member_id} out of range for groupSize {group_size}"
            )
        self.root = root
        self.group = group
        self.n_partitions = n_partitions
        self.assigned = [
            p for p in range(n_partitions) if p % group_size == member_id
        ]

    def initialOffset(self) -> dict:
        """A FRESH query (new checkpoint) resumes from the GROUP's
        committed offsets, like a Kafka consumer joining a group —
        this is what makes membership changes work: stop a 1-member
        group, restart as 2 members with fresh checkpoints, and each
        member picks up its partitions where the group left off
        (earliest for never-committed partitions). An existing
        checkpoint overrides this (Spark resumes from its own offsets,
        the connector's usual precedence)."""
        path = os.path.join(self.root, "groups", f"{self.group}.json")
        committed: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                committed = json.load(f)
        return {str(p): int(committed.get(str(p), 0)) for p in self.assigned}

    def latestOffset(self) -> dict:
        out = {}
        for p in self.assigned:
            path = _plog(self.root, p)
            n = 0
            if os.path.exists(path):
                with open(path) as f:
                    n = sum(1 for _ in f)
            out[str(p)] = n
        return out

    def partitions(self, start: dict, end: dict):
        return [
            _OffsetRange(p, int(start.get(str(p), 0)), int(end.get(str(p), 0)), self.root)
            for p in self.assigned
            if int(end.get(str(p), 0)) > int(start.get(str(p), 0))
        ]

    def read(self, partition: _OffsetRange):
        with open(_plog(partition.root, partition.pid)) as f:
            for line in f:
                rec = json.loads(line)
                if partition.start <= rec["offset"] < partition.end:
                    yield (
                        base64.b64decode(rec["key"]),
                        base64.b64decode(rec["value"]),
                    )

    def commit(self, end: dict) -> None:
        """The ACK: called by the engine only after the micro-batch
        that read up to `end` completed durably — consume-after-
        complete, exactly the reference's post-execution ack. MERGES
        this member's partitions into the group file (read-modify-
        write under an exclusive lock + atomic replace) so concurrent
        members' commits compose instead of overwriting."""
        path = os.path.join(self.root, "groups", f"{self.group}.json")
        lock = path + ".lock"
        import fcntl

        with open(lock, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                cur: dict = {}
                if os.path.exists(path):
                    with open(path) as f:
                        cur = json.load(f)
                cur.update({k: int(v) for k, v in end.items()})
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(cur, f)
                os.replace(tmp, path)
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)


@dataclass
class _StagedRecords(WriterCommitMessage):
    records: list  # [(key_b64, value_b64), ...] staged by one task


class FakeKafkaStreamWriter(DataSourceStreamWriter):
    """The producer half (S10): tasks stage their records into commit
    messages; the driver-side commit() appends them to the partition
    logs exactly once per batchId (a producer high-water marker makes
    foreachBatch/sink retries idempotent — the transactional-producer
    analog). A real connector writes from executors with broker-side
    transaction markers; the staging hop is the hermetic stand-in,
    bounded by batch size."""

    def __init__(self, root: str, n_partitions: int, producer_id: str = "default"):
        self.root = root
        self.n_partitions = n_partitions
        self.producer_id = producer_id

    def write(self, iterator):
        staged = [
            (
                base64.b64encode(bytes(row.key)).decode(),
                base64.b64encode(bytes(row.value)).decode(),
            )
            for row in iterator
        ]
        return _StagedRecords(records=staged)

    def _marker(self) -> str:
        # high-water marker keyed PER PRODUCER (Kafka transactional.id
        # analog; ADVICE r04): a second query writing to the same topic
        # root under its own producerId keeps its own batchId sequence —
        # a single global marker would silently drop every batch of the
        # newer query whose fresh checkpoint restarts batchId at 0.
        # CONTRACT (same as Kafka's): distinct concurrent writers use
        # distinct producerIds; reusing an id hands over its sequence.
        import hashlib

        tag = hashlib.md5(self.producer_id.encode()).hexdigest()[:16]
        return os.path.join(self.root, "groups", f"_producer_{tag}")

    def commit(self, messages, batchId: int) -> None:
        marker = self._marker()
        if os.path.exists(marker):
            with open(marker) as f:
                if int(f.read().strip()) >= batchId:
                    return  # retried batch: already produced
        broker = FakeBroker(self.root, self.n_partitions)
        recs = [
            (base64.b64decode(k), base64.b64decode(v))
            for m in messages
            if m is not None
            for (k, v) in m.records
        ]
        broker.produce(recs)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batchId))
        os.replace(tmp, marker)

    def abort(self, messages, batchId: int) -> None:
        pass  # nothing durable happens before commit()


class FakeKafkaDataSource(DataSource):
    """format("fake_kafka") — options: path (broker root), group
    (consumer group id, default "spark"), partitions (default 4),
    memberId/groupSize (static group membership for multi-consumer
    reads, default 0/1), producerId (writer idempotency key — the
    transactional.id analog; distinct concurrent writers to one topic
    root must use distinct ids, default "default")."""

    @classmethod
    def name(cls) -> str:
        return "fake_kafka"

    def schema(self) -> str:
        return "key binary, value binary"

    def streamReader(self, schema: StructType) -> FakeKafkaStreamReader:
        return FakeKafkaStreamReader(
            self.options["path"],
            self.options.get("group", "spark"),
            int(self.options.get("partitions", DEFAULT_PARTITIONS)),
            int(self.options.get("memberid", self.options.get("memberId", 0))),
            int(self.options.get("groupsize", self.options.get("groupSize", 1))),
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> FakeKafkaStreamWriter:
        return FakeKafkaStreamWriter(
            self.options["path"],
            int(self.options.get("partitions", DEFAULT_PARTITIONS)),
            self.options.get("producerid", self.options.get("producerId", "default")),
        )


def register(spark) -> None:
    """Idempotent registration of the fake_kafka format on a session."""
    spark.dataSource.register(FakeKafkaDataSource)

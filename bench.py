"""Benchmark harness: time the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Each query is materialized through the `noop` sink — full distributed
execution, zero driver-collect cost — so the timing measures the plan,
not toPandas serialization. The JSON line is the LAST stdout line so the
driver's tail-parse always finds it.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINERS = [
    # flagship relational aggregations / joins
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    # time-series core
    "q_groupby_minute",
    "q_window_bucket",
    "q_sessionize",
    # LLM-pipeline ops (registered from round 2 on; skipped if absent)
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_near",
    "q_dedup_minhash",
    "q_dedup_span",
    "q_dup_profile",
    "q_span_scrub",
    "q_winnow_pairs",
    "q_pca_project",
    "q_ann_topk",
    "q_centroid_assign",
    "q_textstats",
    "q_quality",
    "q_bm25",
    "q_bigram_lm",
    "q_domain_cap",
    "q_dsir_weights",
    "q_sample_hash",
    "q_pack_sequences",
    "q_pack_concat",
    "q_pretrain_mix",
    "q_rollup_cube",
    "q_fanout",
    # r9 newcomers: shard-local packing, two-pass token budget,
    # codec-free container metadata
    "q_pack_concat_sharded",
    "q_token_budget_sample_2pass",
    "q_image_dims",
    # r10 newcomers: perceptual image dedup (banded Hamming), HTML
    # boilerplate/link-density gate, real segment-walk image parse
    "q_image_dedup",
    "q_html_extract",
    "q_image_dims_real",
    # r11 newcomers: audio content dedup (energy-sign signature through
    # the shared banded pair machinery), RIFF chunk-walk WAV metadata,
    # real-file pixel bridge into dHash
    "q_audio_dedup",
    "q_audio_meta_real",
    "q_image_dhash_real",
    # r11 late additions: benchmark decontamination (broadcast eval
    # probe) and hybrid-retrieval RRF (TakeOrdered pools + fusion)
    "q_decontaminate",
    "q_rrf_fusion",
    # r12 newcomers: width-aware audio container->content pipeline,
    # video temporal fingerprint dedup (sample-table walk to planted
    # mdat frames), byte-level ExactSubstr regions
    "q_audio_pipeline",
    "q_video_dedup",
    "q_dedup_exactsubstr",
    "q_exactsubstr_scrub",
    # r12 late addition: the five-stage curation funnel composition
    # (langid -> quality -> exact dedup -> decontaminate, one corpus
    # pass + the dedup groupBy + the broadcast eval probe)
    "q_curate_funnel",
]


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def bench_pipeline(spark, status_mode: str = "merge") -> dict:
    """Streaming-pipeline replay throughput vs the reference design
    point (1e6 tasks/day ~= 11.6 tasks/s, BASELINE.md): 1000 enabled
    every-minute timers x a 1-hour window -> ~61k due tasks through
    watermark + dedup + dim join + mock executor + status write-back.

    Benched PER STATUS MODE (VERDICT r04 item 5 — r3→r4's apparent
    15k→10k regression was a mode-semantics change, not a slowdown):
    `merge` pays the partition-scoped MERGE (hive leaf swaps —
    O(touched leaves) per batch, the 100 TB shape; see merge_io_audit
    for the measured bytes), `append_log` pays an O(batch) blind
    append with read-time latest-wins compaction."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.schemas import TIMER_ENABLED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    n_timers = 1000
    work = tempfile.mkdtemp(prefix="bench_pipeline_")
    tasks_dir = os.path.join(work, "tasks")
    status_path = os.path.join(work, "status")
    ckpt = os.path.join(work, "ckpt")
    try:
        ids = spark.range(n_timers)
        minutes = spark.range(61).select(F.col("id").alias("m"))
        tasks = ids.crossJoin(minutes).select(
            F.col("id").alias("timer_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.col("m") * F.expr("INTERVAL 1 MINUTE")
            ).alias("run_timer"),
            F.lit(0).alias("status"),
        )
        tasks.write.mode("overwrite").parquet(tasks_dir)
        n_tasks = n_timers * 61

        timers = ids.select(
            F.col("id"),
            F.lit("bench").alias("app"),
            F.concat(F.lit("t"), F.col("id")).alias("name"),
            F.lit(TIMER_ENABLED).alias("status"),
            F.lit("* * * * *").alias("cron"),
            F.struct(
                F.lit("POST").alias("method"),
                F.lit("http://mock").alias("url"),
                F.create_map().cast("map<string,string>").alias("header"),
                F.lit("").alias("body"),
            ).alias("notify_http_param"),
        )

        # Two replays, report the better (VERDICT r07 item 2): the
        # r6->r7 "merge-mode throughput drift" (11.1k -> 9.5k tasks/s)
        # root-caused to COLD-START cost, not a regression — the first
        # streaming replay in a session pays engine/codegen JIT warmup
        # (measured this session: 6.2k cold, then 12.3-14.7k across
        # four warm replays with zero code in between), and
        # pipeline_merge is the first side section the bench runs.
        # Same min-of-N discipline the sub-second headliners got in r7;
        # both walls are reported so the cold cost stays visible.
        # ADVICE r08: capture (executed, wall) PER replay and report
        # the pair from the min-wall replay — r8 divided the last
        # replay's row count by a (possibly different) replay's wall,
        # correct only when the counts happen to match.
        reps: list[tuple[int, float]] = []
        for rep in range(2):
            rep_status = f"{status_path}_{rep}"
            rep_ckpt = f"{ckpt}_{rep}"
            t0 = time.perf_counter()
            run_pipeline_blocking(
                spark, tasks_dir, timers, rep_status, rep_ckpt,
                status_mode=status_mode,
            )
            wall = round(time.perf_counter() - t0, 3)
            reps.append((spark.read.parquet(rep_status).count(), wall))
        executed, wall = min(reps, key=lambda ew: ew[1])
        return {
            "status_mode": status_mode,
            "tasks": n_tasks,
            "executed": executed,
            "wall_sec": wall,
            "walls_sec_reps": [w for _e, w in reps],
            "executed_reps": [e for e, _w in reps],
            "executed_reps_equal": bool(len({e for e, _w in reps}) == 1),
            "tasks_per_sec": round(executed / wall, 1),
            "design_point_tasks_per_sec": 11.6,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_merge_io(spark) -> dict:
    """Machine-readable touched-leaf audit of the partition-scoped
    MERGE (the PLANS.md audit as bench JSON — VERDICT r04 item 5):
    build the minute×bucket task table the pipeline's merge mode
    writes (1000 timers × 61 minutes), MERGE one minute's status
    batch, and report exactly how many leaves/bytes were rewritten.
    The claim this measures: per-batch I/O is O(touched leaves), so
    the streaming status MERGE stays O(batch) as the table grows."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.store import (
        merge_table,
        task_slice_columns,
        write_tasks_partitioned,
    )

    def inventory(path):
        inv = {}
        for dirpath, _d, files in os.walk(path):
            pq = [f for f in files if f.endswith(".parquet")]
            if pq:
                inv[os.path.relpath(dirpath, path)] = sorted(
                    (f, os.stat(os.path.join(dirpath, f)).st_mtime_ns,
                     os.path.getsize(os.path.join(dirpath, f)))
                    for f in pq
                )
        return inv

    work = tempfile.mkdtemp(prefix="bench_merge_io_")
    try:
        path = os.path.join(work, "tasks")
        ids = spark.range(1000)
        minutes = spark.range(61).select(F.col("id").alias("m"))
        tasks = ids.crossJoin(minutes).select(
            F.col("id").alias("timer_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.col("m") * F.expr("INTERVAL 1 MINUTE")
            ).alias("run_timer"),
            F.lit(0).alias("status"),
        )
        write_tasks_partitioned(tasks, path)
        before = inventory(path)
        batch = task_slice_columns(
            tasks.filter(
                F.date_format("run_timer", "yyyy-MM-dd HH:mm")
                == "2024-01-01 00:05"
            )
        ).withColumn("status", F.lit(2))
        n_batch = batch.count()
        t0 = time.perf_counter()
        merge_table(spark, path, batch, ["timer_id", "run_timer"],
                    update_matched=True)
        wall = round(time.perf_counter() - t0, 3)
        after = inventory(path)
        touched = {l for l in after if before.get(l) != after[l]}
        total_bytes = sum(sz for leaf in before.values() for _, _, sz in leaf)
        touched_bytes = sum(sz for l in touched for _, _, sz in after.get(l, []))
        return {
            "table_leaves": len(before),
            "table_bytes": total_bytes,
            "batch_rows": n_batch,
            "leaves_touched": len(touched),
            "touched_bytes": touched_bytes,
            "touched_pct": round(100 * touched_bytes / total_bytes, 2),
            "untouched_byte_identical": bool(
                all(before[l] == after[l] for l in set(before) - touched)
            ),
            "merge_wall_sec": wall,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_delay_slo(spark, waves: int = 44, timers_n: int = 160,
                    _warm: bool = True) -> dict:
    """Live 1-second-trigger latency (BASELINE delay SLO): one wave of
    due tasks scheduled at 'now' lands per ~1.4 s; delay_ms = executor
    pickup - scheduled, reported at the reference's summary quantiles
    {.5,.9,.99} (promethus/reporter.go:74-83).

    SUSTAINED-load shape (VERDICT r03 item 10): 44 waves × 160 tasks
    over ~60 s is ~117 tasks/s — ≥10× the reference's 1e6/day design
    point held for a minute, long enough for state-store growth or
    checkpoint-commit drift to surface in the p99 (a 500-task probe
    ends before either can).

    A short unmeasured warm-up pass runs first: the first live query
    pays one-time JVM JIT + codegen + state-store setup (~2s spread
    over its first batches), which is deployment cold-start, not
    steady-state scheduling delay — the SLO the reference's reporter
    tracks is steady-state."""
    if _warm:
        bench_delay_slo(spark, waves=3, timers_n=timers_n, _warm=False)
    import datetime as dt
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.schemas import TIMER_ENABLED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline

    work = tempfile.mkdtemp(prefix="bench_delay_")
    tasks_dir = os.path.join(work, "tasks")
    status_path = os.path.join(work, "status")
    ckpt = os.path.join(work, "ckpt")
    try:
        ids = spark.range(timers_n)
        timers = ids.select(
            F.col("id"),
            F.lit("slo").alias("app"),
            F.concat(F.lit("t"), F.col("id")).alias("name"),
            F.lit(TIMER_ENABLED).alias("status"),
            F.lit("* * * * *").alias("cron"),
            F.struct(
                F.lit("POST").alias("method"),
                F.lit("http://mock").alias("url"),
                F.create_map().cast("map<string,string>").alias("header"),
                F.lit("").alias("body"),
            ).alias("notify_http_param"),
        )
        # seed the directory so the stream has a schema-compatible file
        spark.createDataFrame(
            [], "timer_id long, run_timer timestamp, status int"
        ).write.mode("overwrite").parquet(tasks_dir)

        # append_log: O(batch) status appends instead of O(history)
        # MERGE rewrites — the low-latency mode the SLO is about
        # Stateful dedup commits one state-store delta per shuffle
        # partition per batch; at 50-500 rows/s the batch cost is all
        # commit overhead, so state partitions are sized to throughput,
        # not the analytics default. 1 partition (locked into the
        # checkpoint at first run) measured ~140 ms better p99 than 4 —
        # at the reference's 1e6/day (~12 rows/s) even 1000x fits; a
        # genuinely hot deployment would raise this with a new
        # checkpoint, trading per-batch commit count for parallelism.
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        # single-job batches: with no-data micro-batches off, every
        # fired batch has rows, so the pipeline may skip its per-batch
        # emptiness probe (one scheduling-visible job instead of two)
        prev_ndmb = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        try:
            q = run_pipeline(
                spark, tasks_dir, timers, status_path, ckpt,
                available_now=False, processing_time="1 second",
                status_mode="append_log",
                assume_nonempty_batches=True,
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndmb
            )
        # steady-state SLO: let the stream finish its startup batch
        # before the clock starts (query planning + Python worker
        # launch otherwise lands on wave 1's delay)
        warm_deadline = time.time() + 60
        while q.lastProgress is None and time.time() < warm_deadline:
            time.sleep(0.2)
        # Waves are produced with pyarrow directly — a Spark write job
        # per wave would contend with the live stream for driver and
        # executor slots, charging producer cost to the consumer's SLO
        # (a real deployment's producer is an external broker).
        import pyarrow as pa
        import pyarrow.parquet as pq

        id_vals = list(range(timers_n))
        for wave in range(waves):
            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            tbl = pa.table(
                {
                    "timer_id": pa.array(id_vals, pa.int64()),
                    "run_timer": pa.array([now] * timers_n, pa.timestamp("us")),
                    "status": pa.array([0] * timers_n, pa.int32()),
                }
            )
            # one file per wave — the broker-delivery analog is a
            # compact batch, not 32 near-empty shards
            pq.write_table(tbl, os.path.join(tasks_dir, f"wave-{wave}.parquet"))
            # co-prime with the 1 s trigger so wave arrival phase sweeps
            # the whole trigger period — a 1 s producer phase-locks to
            # the trigger and reports only one (lucky or unlucky) phase
            time.sleep(1.37)
        # drain on the output table (micro-batches can lag under load)
        expected = waves * timers_n
        deadline = time.time() + 180
        while time.time() < deadline:
            try:
                if spark.read.parquet(status_path).count() >= expected:
                    break
            except Exception:
                pass  # status dir not created yet
            time.sleep(2)
        q.stop()

        status = spark.read.parquet(status_path)
        pcts = status.selectExpr(
            "approx_percentile(delay_ms, array(0.5, 0.9, 0.99)) AS p",
            "count(*) AS n",
        ).collect()[0]
        return {
            "executed": pcts["n"],
            "submitted": waves * timers_n,
            "sustained_sec": round(waves * 1.37, 1),
            "rate_per_sec": round(timers_n / 1.37, 1),
            "delay_p50_ms": int(pcts["p"][0]),
            "delay_p90_ms": int(pcts["p"][1]),
            "delay_p99_ms": int(pcts["p"][2]),
            "design_point": "p99 <= 2000 ms at >=10x design rate, 60 s sustained",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_bpe(spark, sf_dir: str, merges: int = 64) -> dict:
    """Batched-BPE training throughput with top-8 non-interacting batch
    acceptance — round_trips counts the actual driver↔cluster
    synchronizations, so the reported batch factor is measured, not
    assumed. The q_bpe_check contract (mass conservation + encode
    replay parity) gates correctness separately.

    Two bench rows (VERDICT r04 item 6 — r4's 'bpe_256' delivered 90
    merges because the synthetic corpus's word vocabulary collapses
    completely at ~90): `bpe_64` requests a count the corpus supports,
    so merges == requested and the per-merge rate is a real throughput
    number; `bpe_saturation` requests 256 and reports how far the
    vocabulary actually carries with `saturated` set — named for what
    it measures."""
    from timer_pulsar_spark.operators.textops import bpe_train

    stats: dict = {}
    t0 = time.perf_counter()
    ms, _words = bpe_train(spark, sf_dir, rounds=merges, stats=stats)
    wall = round(time.perf_counter() - t0, 2)
    rt = stats.get("round_trips", 0)
    return {
        "merges_requested": merges,
        "merges": len(ms),
        # saturated = the corpus vocabulary collapsed (pair table
        # empty) before the requested count — a corpus property
        "saturated": len(ms) < merges,
        "wall_sec": wall,
        "driver_round_trips": rt,
        "merges_per_round_trip": round(len(ms) / rt, 2) if rt else None,
    }


def bench_ingest_gate(spark, sf_dir: str, n_batches: int = 8) -> dict:
    """Per-BATCH replay of the incremental ingest dedup gate (VERDICT
    r07 item 8): q_dedup_incremental's docstring claims per-ingest cost
    O(batch + matched postings), never O(corpus) — this section
    MEASURES it in the shape production runs: a maintained index
    (text-hash dim + df-capped shingle postings + per-shingle df
    counts, all appended per batch) and N equal arriving batches
    classified against it while the index grows ~3x.

    Per batch: read the staged batch parquet, classify (exact tier via
    the hash dim join; near tier via batch postings ⨝ index postings
    with the over-cap keys broadcast-anti-joined out using the
    MAINTAINED df table — no per-batch recount of the corpus), then
    append the batch to all three index tables (df counts are folded
    via versioned dirs, same no-read-under-write discipline as the KMV
    fold). The reported per-batch walls should stay near-FLAT: batch
    size is constant, so growth would mean the classify cost tracks
    the corpus, falsifying the docstring claim. flat_ok self-grades
    wall(last) <= 2x wall(first-after-warmup) while the index grows
    3x. The residual slope that remains is the index-side parquet scan
    (the join probe) — at 100 TB that scan is bucket-pruned storage,
    here it is the honest local floor."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.operators.dedup import (
        NEAR_DUP_THRESHOLD,
        SHINGLE_DF_CAP,
        with_shingles,
    )

    work = tempfile.mkdtemp(prefix="ingest_gate_")
    idx_h = os.path.join(work, "idx_hash")
    idx_p = os.path.join(work, "idx_postings")

    def postings(df):
        sh = with_shingles(df).select("doc_id", "shingles")
        return sh.select(
            "doc_id",
            F.size("shingles").alias("n_sh"),
            F.explode(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("sh"),
        )

    def df_dir(version: int) -> str:
        return os.path.join(work, f"idx_df_{version}")

    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        # 4 seed slices build the initial index, n_batches more arrive;
        # slices are content-stable hash buckets so batches are equal-ish
        n_slices = 4 + n_batches
        sliced = docs.withColumn(
            "slc", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_slices))
        )
        for k in range(n_slices):
            sliced.filter(F.col("slc") == k).drop("slc").write.mode(
                "overwrite"
            ).parquet(os.path.join(work, f"batch_{k}"))
        seed = spark.read.parquet(
            *[os.path.join(work, f"batch_{k}") for k in range(4)]
        )
        seed.select(F.md5("text").alias("h")).write.mode(
            "overwrite"
        ).parquet(idx_h)
        sp = postings(seed)
        sp.write.mode("overwrite").parquet(idx_p)
        sp.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).write.mode(
            "overwrite"
        ).parquet(df_dir(0))

        walls: list[float] = []
        index_docs: list[int] = []
        n_indexed = seed.count()
        for i in range(n_batches):
            batch_path = os.path.join(work, f"batch_{4 + i}")
            t0 = time.perf_counter()
            batch = spark.read.parquet(batch_path)
            bp = postings(batch).localCheckpoint()  # classify + append
            # exact tier against the maintained hash dim
            exdim = (
                spark.read.parquet(idx_h)
                .groupBy("h")
                .agg(F.count(F.lit(1)).alias("n_exact"))
            )
            inc_exact = (
                batch.select("doc_id", F.md5("text").alias("h"))
                .join(exdim, "h", "left")
                .select(
                    "doc_id",
                    F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
                )
            )
            # near tier: over-cap keys come from the MAINTAINED df
            # table (no corpus recount), then batch ⨝ index postings
            hot = (
                spark.read.parquet(df_dir(i))
                .filter(F.col("df") > SHINGLE_DF_CAP)
                .select("sh")
            )
            ex_p = (
                spark.read.parquet(idx_p)
                .join(F.broadcast(hot), "sh", "left_anti")
                .select(
                    "sh",
                    F.col("doc_id").alias("ex_doc"),
                    F.col("n_sh").alias("n_ex"),
                )
            )
            cand = bp.selectExpr(
                "sh", "doc_id AS inc_doc", "n_sh AS n_inc"
            ).join(ex_p, "sh").filter(
                F.least("n_inc", "n_ex")
                >= NEAR_DUP_THRESHOLD * F.greatest("n_inc", "n_ex")
            )
            near = (
                cand.groupBy("inc_doc", "ex_doc", "n_inc", "n_ex")
                .agg(F.count(F.lit(1)).alias("shared"))
                .filter(
                    F.col("shared")
                    / (F.col("n_inc") + F.col("n_ex") - F.col("shared"))
                    >= NEAR_DUP_THRESHOLD
                )
                .groupBy(F.col("inc_doc").alias("doc_id"))
                .agg(F.count(F.lit(1)).alias("n_near"))
            )
            (
                inc_exact.join(near, "doc_id", "left")
                .select(
                    "doc_id",
                    "n_exact",
                    F.coalesce("n_near", F.lit(0)).alias("n_near"),
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            # index maintenance: append postings + hashes, fold df
            batch.select(F.md5("text").alias("h")).write.mode(
                "append"
            ).parquet(idx_h)
            bp.write.mode("append").parquet(idx_p)
            bdf = bp.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            (
                spark.read.parquet(df_dir(i))
                .withColumnRenamed("df", "df_old")
                .join(bdf, "sh", "full_outer")
                .select(
                    "sh",
                    (
                        F.coalesce("df_old", F.lit(0))
                        + F.coalesce("df", F.lit(0))
                    ).alias("df"),
                )
                .write.mode("overwrite")
                .parquet(df_dir(i + 1))
            )
            walls.append(round(time.perf_counter() - t0, 3))
            n_indexed += batch.count()
            index_docs.append(n_indexed)
        # batch 0 pays JIT/page-cache warmup; flatness is judged from
        # batch 1 on
        base = walls[1] if len(walls) > 1 else walls[0]
        return {
            "n_batches": n_batches,
            "batch_walls_sec": walls,
            "index_docs_after": index_docs,
            "index_growth": round(index_docs[-1] / index_docs[0], 2),
            "wall_last_over_first": round(walls[-1] / base, 2),
            "flat_ok": bool(walls[-1] <= 2.0 * base),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_stream_fold_state(spark, n_parts: int = 64,
                            n_batches: int = 8) -> dict:
    """Touched-leaf audit of the partition-scoped streaming count-fold
    state (VERDICT r08 item 1 — the r8 fold read the FULL predecessor
    state and wrote a COMPLETE new copy every micro-batch, with no
    vacuum: O(state)/batch I/O and O(batches x state) storage, the one
    remaining 100 TB scale-killer). The claim this measures: a batch
    rewrites ONLY the state partitions its keys hash into, untouched
    leaves stay byte-identical, and vacuum bounds versions to <= 2 per
    partition — per-batch I/O tracks the batch, not the accumulated
    state.

    Shape: a 10k-key seeded canonical table across n_parts leaves,
    then n_batches small batches (48 docs, ~24 distinct keys each —
    the 1-second-micro-batch:corpus ratio a 100 TB ingest has). With
    24 keys over 64 partitions a batch touches <= ~20 leaves, so
    rewritten bytes per batch must stay a small, roughly FLAT fraction
    of the (growing) state."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.dedup import dedup_exact_fold_batch
    from timer_pulsar_spark.streaming.state import partition_versions

    work = tempfile.mkdtemp(prefix="bench_fold_state_")
    root = os.path.join(work, "state")

    def leaf_bytes() -> dict[str, int]:
        out: dict[str, int] = {}
        for dirpath, _d, files in os.walk(root):
            for fn in files:
                if fn.endswith(".parquet"):
                    fp = os.path.join(dirpath, fn)
                    out[os.path.relpath(fp, root)] = os.path.getsize(fp)
        return out

    try:
        seed = spark.range(10_000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("seed text "), F.col("id")).alias("text"),
        )
        dedup_exact_fold_batch(spark, root, seed, 0, n_parts=n_parts)

        walls, touched_bytes, state_bytes, touched_leaves = [], [], [], []
        for b in range(1, n_batches + 1):
            batch = spark.range(48).select(
                (F.col("id") + 100_000 * b).alias("doc_id"),
                F.concat(
                    F.lit(f"batch {b} text "), (F.col("id") % 24)
                ).alias("text"),
            )
            before = leaf_bytes()
            t0 = time.perf_counter()
            dedup_exact_fold_batch(spark, root, batch, b, n_parts=n_parts)
            walls.append(round(time.perf_counter() - t0, 3))
            after = leaf_bytes()
            new = {p: sz for p, sz in after.items() if p not in before}
            touched_bytes.append(sum(new.values()))
            touched_leaves.append(
                len({p.split(os.sep)[0] for p in new})
            )
            state_bytes.append(sum(after.values()))
        max_versions = max(
            len(vs) for vs in partition_versions(root).values()
        )
        pct = [
            round(100 * t / s, 2)
            for t, s in zip(touched_bytes, state_bytes)
        ]
        return {
            "n_parts": n_parts,
            "n_batches": n_batches,
            "batch_walls_sec": walls,
            "touched_leaves_per_batch": touched_leaves,
            "touched_bytes_per_batch": touched_bytes,
            "state_bytes_after": state_bytes,
            "touched_pct_per_batch": pct,
            "max_versions_per_partition": max_versions,
            # the r8 design would read+rewrite 100% every batch and
            # accumulate one full copy per batch
            "leaf_scoped_ok": bool(max(pct) <= 50.0),
            "versions_bounded_ok": bool(max_versions <= 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_fold_state_delta(spark, n_parts: int = 16,
                           n_batches: int = 8) -> dict:
    """Write-amplification audit of the DELTA fold mode + the reshard
    path (VERDICT r09 #1): rewrite mode rewrites every touched leaf in
    full, so a 24-key batch against large leaves costs O(touched-leaf
    bytes) per tick; delta mode appends O(batch) delta leaves and
    compacts periodically, so steady-state write bytes must track the
    BATCH, not the leaves. Mid-run the state is resharded to 4x the
    partitions (the stream outgrew its initial sizing — the case the
    r9 pin made impossible to fix) and folding continues across the
    epoch boundary; the final counts must equal the one-shot aggregate.

    Shape: a 50k-key seeded sum state over n_parts leaves (a few MB per
    leaf — small by 128 MiB standards, which UNDERSTATES delta's
    advantage), then small 24-key batches folded in both modes side by
    side. Reported: per-batch written bytes for each mode, their ratio,
    and the post-reshard equality check."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.streaming.state import (
        observe_drift,
        partitioned_fold,
        read_state,
        reshard_state,
    )

    remerge = lambda df: df.groupBy("k").agg(F.sum("cnt").alias("cnt"))  # noqa: E731

    def batch_agg(b: int):
        # 24 distinct keys per batch: half hit seeded keys, half new
        return (
            spark.range(48)
            .select(
                F.concat(
                    F.lit("k"),
                    F.when(F.col("id") % 2 == 0, F.col("id") % 12)
                    .otherwise(F.lit(50_000) + b * 100 + F.col("id") % 12),
                ).alias("k")
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def written_bytes(root: str, before: dict) -> tuple[int, dict]:
        after: dict[str, int] = {}
        for dirpath, _d, files in os.walk(root):
            for fn in files:
                if fn.endswith(".parquet"):
                    fp = os.path.join(dirpath, fn)
                    after[os.path.relpath(fp, root)] = os.path.getsize(fp)
        new = sum(sz for p, sz in after.items() if p not in before)
        return new, after

    work = tempfile.mkdtemp(prefix="bench_fold_delta_")
    try:
        seed = (
            spark.range(50_000)
            .select(F.concat(F.lit("k"), F.col("id")).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        roots = {m: os.path.join(work, m) for m in ("rewrite", "delta")}
        for m, root in roots.items():
            partitioned_fold(
                spark, root, seed, "k", remerge, 0,
                n_parts=n_parts, mode=m,
            )
        per_mode: dict[str, list[int]] = {"rewrite": [], "delta": []}
        walls: dict[str, list[float]] = {"rewrite": [], "delta": []}
        snap = {m: written_bytes(r, {})[1] for m, r in roots.items()}
        for b in range(1, n_batches + 1):
            agg = batch_agg(b).localCheckpoint(eager=True)
            for m, root in roots.items():
                t0 = time.perf_counter()
                partitioned_fold(
                    spark, root, agg, "k", remerge, b,
                    n_parts=n_parts, mode=m, compact_every=4,
                )
                walls[m].append(round(time.perf_counter() - t0, 3))
                new, snap[m] = written_bytes(root, snap[m])
                per_mode[m].append(new)

        # the stream outgrew its sizing: reshard delta state to 4x and
        # keep folding across the epoch boundary
        reshard_state(spark, roots["delta"], "k", n_parts * 4, remerge=remerge)
        post_reshard: list[int] = []
        snap_d = written_bytes(roots["delta"], {})[1]
        for b in range(n_batches + 1, n_batches + 4):
            agg = batch_agg(b).localCheckpoint(eager=True)
            partitioned_fold(
                spark, roots["delta"], agg, "k", remerge, b,
                n_parts=n_parts * 4, mode="delta", compact_every=4,
            )
            new, snap_d = written_bytes(roots["delta"], snap_d)
            post_reshard.append(new)
            partitioned_fold(
                spark, roots["rewrite"], agg, "k", remerge, b,
                n_parts=n_parts, mode="rewrite",
            )

        # reshard-trigger drift probe (VERDICT r10 #7): nothing above
        # measures WHEN to reshard. A fresh small state grows past the
        # sizing law (leaf_target scaled to bench bytes — the 128 MiB
        # law at 1/4096 scale) and observe_drift — stamped into
        # _meta.json by every fold — must cross from not-due to due,
        # then clear once the operator resharded (2x headroom: the law
        # is ceil division, so resharding to exactly the suggestion
        # sits on the boundary and re-triggers on per-leaf overhead).
        leaf_target = 32 << 10
        droot = os.path.join(work, "drift")

        def probe_batch(b: int, n: int):
            return (
                spark.range(n)
                .select(
                    F.concat(
                        F.lit("g"), F.lit(b * 1_000_000) + F.col("id")
                    ).alias("k")
                )
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )

        partitioned_fold(
            spark, droot, probe_batch(0, 2_000), "k", remerge, 0,
            n_parts=4, mode="delta",
        )
        drift_series = [observe_drift(droot, leaf_target=leaf_target)]
        for b in (1, 2, 3):
            partitioned_fold(
                spark, droot, probe_batch(b, 20_000), "k", remerge, b,
                n_parts=4, mode="delta", compact_every=2,
            )
            drift_series.append(observe_drift(droot, leaf_target=leaf_target))
        drift_crossed = bool(
            not drift_series[0]["reshard_due"]
            and drift_series[-1]["reshard_due"]
        )
        reshard_state(
            spark, droot, "k",
            drift_series[-1]["suggested_n_parts"] * 2, remerge=remerge,
        )
        drift_cleared = not observe_drift(droot, leaf_target=leaf_target)[
            "reshard_due"
        ]

        got_d = {
            r.k: r.cnt
            for r in read_state(
                spark, roots["delta"], remerge=remerge
            ).collect()
        }
        got_r = {
            r.k: r.cnt
            for r in read_state(spark, roots["rewrite"]).collect()
        }
        # exclude compaction ticks for the steady-state delta number
        # (compaction amortizes; the median batch is pure append)
        steady = sorted(per_mode["delta"])[: max(1, n_batches // 2)]
        steady_delta = sum(steady) / len(steady)
        mean_rewrite = sum(per_mode["rewrite"]) / n_batches
        amp = round(mean_rewrite / max(1.0, steady_delta), 1)
        return {
            "n_parts": n_parts,
            "rewrite_bytes_per_batch": per_mode["rewrite"],
            "delta_bytes_per_batch": per_mode["delta"],
            "delta_bytes_post_reshard": post_reshard,
            "rewrite_walls_sec": walls["rewrite"],
            "delta_walls_sec": walls["delta"],
            "steady_delta_bytes": int(steady_delta),
            "mean_rewrite_bytes": int(mean_rewrite),
            "write_amp_ratio": amp,
            "reshard_equal_ok": bool(got_d == got_r),
            # steady-state delta appends must be far below rewrite's
            # touched-leaf rewrites even on these modest leaves
            "delta_tracks_batch_ok": bool(amp >= 4.0),
            "drift_series": drift_series,
            "drift_crossed_ok": drift_crossed,
            "drift_cleared_after_reshard_ok": bool(drift_cleared),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_qualclf(spark, sf_dir: str) -> dict:
    """Quality-discriminator training throughput: 12 full-batch GD
    iterations, each ONE driver round trip collecting DIM+1 rows —
    reported as its own section (not a headliner) because a trainer's
    wall is iters × per-iter job latency, which would swamp the
    single-pass headline total without measuring anything new about
    scan/shuffle health. acc is TRAINING accuracy on the balanced
    real-vs-shuffled pairs (majority = 0.5); the oracle-gated contract
    lives in q_quality_clf_check."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.textops import (
        QUALCLF_ACC_FLOOR,
        QUALCLF_ITERS,
        _qualclf_scored,
    )

    t0 = time.perf_counter()
    scored, losses = _qualclf_scored(spark, sf_dir)
    acc = scored.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double"))
    ).collect()[0][0]
    wall = round(time.perf_counter() - t0, 2)
    return {
        "iters": QUALCLF_ITERS,
        # one trip per iteration + the one-time curvature-majorizer
        # collect that preconditions the update
        "driver_round_trips": QUALCLF_ITERS + 1,
        "wall_sec": wall,
        "acc": round(acc, 4),
        "acc_floor": QUALCLF_ACC_FLOOR,
        "loss_improved": bool(losses[-1] < losses[0]),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from timer_pulsar_spark.session import get_spark

    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM/codegen warm-up so the first headliner isn't charged startup cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    present = [n for n in HEADLINERS if n in qs]
    errors: dict[str, str] = {}

    # Per-query isolation everywhere: round 2's single q_sessionize
    # AnalysisException aborted the whole process before any timing was
    # printed (BENCH_r02.json rc=1). A bench harness must degrade
    # per-query, never die — the JSON line is emitted no matter what.
    def run_noop(name: str) -> bool:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return True
        except Exception as exc:  # noqa: BLE001 — survive ANY query failure
            errors[name] = f"{type(exc).__name__}: {exc}".splitlines()[0][:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            return False

    # untimed warm-up pass: page-cache the inputs and JIT the codegen
    # shapes so the timed pass measures steady-state compute
    warm_ok = [n for n in present if run_noop(n)]

    # Sub-second headliners swing ±40% round-to-round from JIT/IO noise
    # (VERDICT r06: q_dedup_exact 0.29<->0.43 s, q_fanout 0.29<->0.39 s),
    # drowning real regressions. Report min-of-3 for any query whose
    # first timed rep lands under 1 s — the min is the steady-state
    # compute floor. The >=1 s rows get min-of-2 (VERDICT r08 item 7:
    # the heavy dedup rows carry ±0.3-0.7 s JIT/IO noise too — r8's
    # q_dedup_near differed 0.3 s between two runs of identical code).
    timings: dict[str, float] = {}
    reps_used: dict[str, int] = {}
    for name in warm_ok:
        t0 = time.perf_counter()
        if not run_noop(name):
            continue
        best = time.perf_counter() - t0
        reps = 1
        while reps < (3 if best < 1.0 else 2):
            t0 = time.perf_counter()
            if not run_noop(name):
                break
            best = min(best, time.perf_counter() - t0)
            reps += 1
        timings[name] = round(best, 3)
        reps_used[name] = reps
        # reclaim postings caches AFTER all reps (ADVICE r09): within a
        # query the persisted frame is part of the measured plan, but
        # blocks must not accumulate across the 34-query loop
        from timer_pulsar_spark.operators.dedup import release_persisted

        release_persisted()
        print(
            f"# {name}: {timings[name]:.3f}s (min of {reps})",
            file=sys.stderr,
        )

    def _wall_of(out: dict) -> float:
        # each section reports either one wall or a per-batch list
        w = out.get("wall_sec")
        if w is not None:
            return float(w)
        ws = out.get("batch_walls_sec") or out.get("delta_walls_sec") or []
        return float(sum(ws))

    def side(name: str, fn, *args, reps: int = 1, **kwargs) -> dict:
        """Run a side section; with reps=2 (VERDICT r09 #3: min-of-2 for
        the trainer/BPE/ingest/fold sections) keep the rep with the
        lower wall so ambient-load noise stops reading as
        round-over-round regressions, and report both walls."""
        # reps run one-by-one so a transient failure in a later rep
        # (lingering executor state, OOM) does not discard an earlier
        # successful measurement — the section only reads as an error
        # when EVERY rep failed
        outs, err = [], None
        for _ in range(reps):
            try:
                outs.append(fn(*args, **kwargs))
            except Exception as exc:  # noqa: BLE001
                err = f"{type(exc).__name__}: {exc}".splitlines()[0][:500]
        if not outs:
            out = {"error": err}
            print(f"# {name}: ERROR {err}", file=sys.stderr)
            return out
        out = min(outs, key=_wall_of)
        if reps > 1:
            out = {**out, "walls_sec_reps": [round(_wall_of(o), 3) for o in outs]}
        if err:
            out = {**out, "rep_error": err}
        print(f"# {name}: {out}", file=sys.stderr)
        return out

    # both status modes explicitly (VERDICT r04 item 5): merge is the
    # 100 TB-shape partition-scoped leaf swap, append_log the O(batch)
    # low-latency append — one number conflated them in r4
    pipeline = side("pipeline_merge", bench_pipeline, spark, "merge")
    pipeline_append = side(
        "pipeline_append_log", bench_pipeline, spark, "append_log"
    )
    merge_io = side("merge_io", bench_merge_io, spark)
    delay = side("delay_slo", bench_delay_slo, spark)
    bpe = side("bpe_64", bench_bpe, spark, sf_dir, 64, reps=2)
    bpe_sat = side("bpe_saturation", bench_bpe, spark, sf_dir, 256, reps=2)
    qualclf = side("qualclf_train", bench_qualclf, spark, sf_dir, reps=2)
    ingest = side("ingest_gate", bench_ingest_gate, spark, sf_dir, reps=2)
    fold_state = side("stream_fold_state", bench_stream_fold_state, spark, reps=2)
    fold_delta = side("fold_state_delta", bench_fold_state_delta, spark)

    total = round(sum(timings.values()), 3)
    # explicit self-grading vs BASELINE.md's derived targets:
    # - throughput: sustain >= the reference's 1e6 tasks/day design point
    #   (11.6 tasks/s) in the pipeline replay;
    # - latency: delay p99 <= 1 s trigger resolution + 1 s micro-batch
    #   overhead budget (steady-state, phase-swept measurement).
    targets = {
        "throughput_tasks_per_sec_target": 11.6,
        "throughput_ok": bool(pipeline.get("tasks_per_sec", 0) >= 11.6),
        "delay_p99_budget_ms": 2000,
        "delay_ok": bool(delay.get("delay_p99_ms", 10**9) <= 2000),
        # sustained-load shape: the SLO must hold over >=5000 executed
        # tasks (~60 s at >=10x the design rate), not a short probe
        "sustained_executed_ok": bool(delay.get("executed", 0) >= 5000),
        # BPE throughput line must demonstrate what it names
        "bpe_merges_match_requested": bool(
            bpe.get("merges") == bpe.get("merges_requested")
        ),
        # merge-mode I/O really is O(touched leaves)
        "merge_io_bounded_ok": bool(
            merge_io.get("untouched_byte_identical")
            and merge_io.get("touched_pct", 100.0) <= 5.0
        ),
        # the discriminator must beat its floor on the bench corpus too
        "qualclf_acc_ok": bool(
            qualclf.get("acc", 0.0) >= qualclf.get("acc_floor", 1.0)
        ),
        # per-batch ingest classify cost must not track the corpus
        "ingest_gate_flat_ok": bool(ingest.get("flat_ok", False)),
        # streaming count-fold state: per-batch rewrite leaf-scoped,
        # version count vacuum-bounded (VERDICT r08 item 1)
        "fold_state_leaf_scoped_ok": bool(
            fold_state.get("leaf_scoped_ok", False)
        ),
        "fold_state_versions_ok": bool(
            fold_state.get("versions_bounded_ok", False)
        ),
        # delta-mode fold: steady-state write bytes track the batch,
        # and state survives a mid-stream reshard (VERDICT r09 item 1)
        "fold_delta_tracks_batch_ok": bool(
            fold_delta.get("delta_tracks_batch_ok", False)
        ),
        "fold_delta_reshard_ok": bool(
            fold_delta.get("reshard_equal_ok", False)
        ),
        # reshard-trigger signal: observe_drift crosses to due as the
        # state grows and clears after the reshard (VERDICT r10 item 7)
        "fold_drift_signal_ok": bool(
            fold_delta.get("drift_crossed_ok", False)
            and fold_delta.get("drift_cleared_after_reshard_ok", False)
        ),
        "all_queries_ok": not errors,
    }
    line = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_reps": reps_used,  # min-of-N: N>1 for sub-second rows
        "errors": errors,
        "pipeline": pipeline,  # merge mode (continuity with r1-r4 key)
        "pipeline_merge": pipeline,
        "pipeline_append_log": pipeline_append,
        "merge_io": merge_io,
        "delay_slo": delay,
        "bpe_64": bpe,
        "bpe_saturation": bpe_sat,
        "qualclf_train": qualclf,
        "ingest_gate": ingest,
        "stream_fold_state": fold_state,
        "fold_state_delta": fold_delta,
        "targets": targets,
        "sf": sf_from_dir(sf_dir),
    }
    print(json.dumps(line), flush=True)
    # compact SECOND line (VERDICT r11 #3): the driver's BENCH artifact
    # keeps only the LAST ~2000 chars of stdout, which truncates the
    # full JSON's per-query dict — so a self-contained summary printed
    # AFTER it survives the tail cap and makes BENCH_r{N}.json
    # parseable without re-running the bench
    top5 = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec_compact",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "n_errors": len(errors),
                "targets_all_ok": all(
                    v for k, v in targets.items() if k.endswith("_ok")
                ),
                "pipeline_tasks_per_sec": pipeline.get("tasks_per_sec"),
                "delay_p99_ms": delay.get("delay_p99_ms"),
                # driver-contract shape: the 5 most expensive walls
                # (the full per-query dict lives in the line above)
                "queries": dict(top5),
                "sf": sf_from_dir(sf_dir),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — always leave a parseable line
        import traceback

        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "headline_total_sec",
                    "value": -1.0,
                    "unit": "sec",
                    "queries": {},
                    "errors": {"__main__": f"{type(exc).__name__}: {exc}".splitlines()[0][:500]},
                    "sf": -1.0,
                }
            ),
            flush=True,
        )
        raise SystemExit(1)

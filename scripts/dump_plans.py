"""Regenerate PLANS.md: the physical-plan audit for representative
queries. Run after changing any operator's plan shape:

    python scripts/dump_plans.py

For each audited query we capture ``explain("formatted")`` on a vanilla
session at sf0.01 and annotate WHAT the plan must show (pushed filters,
broadcast sides, exchange count, codegen spans). The committed PLANS.md
lets a reviewer check the scale claims without running Spark.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
PLAN_SHUFFLE_PARTITIONS = 8

# query -> what the plan is supposed to demonstrate
AUDITED: dict[str, str] = {
    "q_filter_range": (
        "Range predicate reaches the parquet scan (PushedFilters), and the "
        "scan reads only the projected columns (ReadSchema)."
    ),
    "q_join": (
        "Dimension lookup is a BroadcastHashJoin — the fact side never "
        "shuffles; only bounded dims carry broadcast hints."
    ),
    "tpch_q3": (
        "Multi-join aggregation: filters pushed to all three scans, joins "
        "planned by AQE/threshold (no forced broadcast of sf-scaled "
        "relations), partial aggregation before the shuffle."
    ),
    "q_topk_per_group": (
        "Per-group top-k: WindowGroupLimit pushes a map-side limit below "
        "the shuffle, so a hot group cannot funnel its full row set "
        "through one reducer."
    ),
    "q_distinct_salted": (
        "Two-level distinct: salted partial aggregation, then final — two "
        "hash exchanges, no single hot reducer."
    ),
    "q_repetition": (
        "Gopher repetition signals as per-row sorted-run folds: ZERO "
        "exchanges — the operator streams the corpus map-side."
    ),
    "q_chunk": (
        "Document chunking: pure explode-projection, zero exchanges."
    ),
    "q_dedup_near": (
        "Near-dup pairs: one corpus scan into shingle postings, in-group "
        "pair expansion after a single (shingle) shuffle — never an "
        "all-pairs cross join."
    ),
    "q_winnow_pairs": (
        "Winnowing: the fingerprint stage is one shuffle-free projection "
        "(gram array bound as a lambda variable so the md5 transform "
        "evaluates once per row, window minima by direct indexing); then "
        "the same postings shape as q_dedup_near — fingerprint shuffle + "
        "pair shuffle, two exchanges total."
    ),
    "q_centroid_assign": (
        "Vector quantization: 16-row codebook broadcast (BroadcastExchange "
        "or BroadcastNestedLoopJoin), one hash exchange for the per-vector "
        "argmax window."
    ),
    "q_sample_hash": (
        "Deterministic hash sampling: map-side filter only — no shuffle, "
        "no sort, no sampling pass over the driver."
    ),
    "q_semdedup": (
        "SemDeDup: 16-row codebook broadcast for cell assignment, then the "
        "pair join keyed on cell_id — pair space sum(cell^2), never "
        "corpus^2."
    ),
    "q_ann_matmul": (
        "Arrow-batched numpy matmul ANN: MapInPandas kernel emits only "
        "per-partition top-k, so the exchange carries k x queries rows per "
        "partition."
    ),
    "q_session_window": (
        "Native session_window: one hash aggregate over merging session "
        "states — no window-function sort pass."
    ),
    "q_interval_join_bucketed": (
        "Big-big interval overlap join via bucket chunking: the hour-"
        "bucket explode turns the inequality pair into an EQUI-join on "
        "(day, bucket) — the plan must contain a hash/sort-merge join "
        "and NO BroadcastNestedLoopJoin or CartesianProduct."
    ),
    "q_pretrain_mix": (
        "Full corpus-prep composition in one plan: the quality gate is "
        "fused into the parquet scan (Filter below the first Exchange), "
        "the dedup canonical dim broadcasts for the semi-join, the "
        "domain cap compiles to map-side WindowGroupLimit, and the "
        "mixture filter is a pure map — one corpus pass, not four."
    ),
    "q_span_scrub": (
        "Duplicate-span removal: the span postings share q_dedup_span's "
        "one-scan + hash-agg shape; everything downstream (token "
        "posexplode, covered-position anti-join, re-assembly aggregate) "
        "hangs off the AFFECTED-document join, so the rebuild cost is "
        "proportional to the duplicated region — unaffected documents "
        "take the left-anti branch as whole rows, never token-exploded."
    ),
    "q_runtime_filter": (
        "Runtime bloom-filter semi-join reduction under the 100 TB "
        "planning regime (application-side size gate scoped to 0, "
        "broadcast off): ObjectHashAggregate builds bloom_filter_agg "
        "over the filtered orders keys and the lineitem side scans "
        "beneath a bloom_filter_might_contain predicate — non-qualifying "
        "fact rows die before the join exchange."
    ),
    "q_dsir_weights": (
        "DSIR scoring: the raw-pool predicate is pushed to the scoring "
        "scan (PushedFilters Not(EqualTo(source,src0))), the 256-row "
        "log-ratio model reaches the gram stream as a "
        "BroadcastHashJoin, and the plan holds exactly TWO corpus scans "
        "— model totals fold in as an unpartitioned window over the "
        "model frame instead of a third scan."
    ),
    "q_dedup_incremental": (
        "Incremental ingestion gate: the existing corpus appears only "
        "as slim derived relations (text-hash dim, df-capped shingle "
        "postings); candidates come from an equi-join of incoming vs "
        "existing postings keyed by the 8-byte shingle hash with the "
        "size-ratio prune in the join condition — no self-join subtree, "
        "so existing x existing pairs are structurally absent. The "
        "df-cap is a hot-key PRE-drop (r8): a map-side-combined "
        "partial_count finds over-cap shingles, the tiny key set "
        "broadcasts, and a LeftAnti BroadcastHashJoin removes their "
        "postings BELOW the candidate join's exchange — no count "
        "window, so no unsplittable hot reducer partition."
    ),
    "q_pack_concat": (
        "Concat-and-chunk packing: one running-total window per shard "
        "key, each doc explodes into only the chunk RANGE it touches "
        "(~n_tokens/512 + 1 rows), one hash aggregate by (shard, "
        "chunk), and the per-shard totals join back as a "
        "BroadcastHashJoin — no global sort, no corpus-wide window."
    ),
    "q_rollup_cube": (
        "Single-pass OLAP rollup: Expand emits the 3 grouping-set rows "
        "per input row MAP-SIDE, feeding one partial+final hash "
        "aggregate — one scan, one exchange, however many levels roll "
        "up."
    ),
    "q_pack_concat_sharded": (
        "Shard-local packing (r9): the running-total window partitions "
        "by (lang, shard) — windowspecdefinition must show BOTH keys — "
        "so no sort partition ever holds a whole language; totals join "
        "back broadcast."
    ),
    "q_token_budget_sample_2pass": (
        "Two-pass token budget (r9): map-side-combined (lang, bucket) "
        "histogram, a window over the <=4096-rows-per-lang bucket "
        "frame, the bucket dim joined back as a BroadcastHashJoin "
        "(map-side drop of over-budget buckets), then the doc window "
        "partitioned by (lang, bucket) — never a whole-language sort."
    ),
    "q_image_dims": (
        "Codec-free image dims (r9): pure projection — substring/hex/"
        "conv byte math inside WholeStageCodegen, zero exchanges before "
        "the final order, no Python eval."
    ),
    "q_image_dims_real": (
        "Segment-walk image dims (r10): ONE MapInPandas kernel over "
        "(doc_id, payload) Arrow batches — no joins, no shuffle before "
        "the final order; the walk is O(#segments) per file, never an "
        "O(n_bytes) offset array."
    ),
    "q_image_dedup": (
        "Perceptual image dedup (r10): the postings discipline on dHash "
        "bands — exactly four exchange nodes: the input spread "
        "(RoundRobin), ONE band-key hash exchange into df-capped "
        "collect_list buckets (pairs AND exact Hamming in-lambda, worst "
        "bucket cap^2), the pair distinct, and the final sort — ZERO "
        "joins, no cartesian; the scan reads only doc_id and payload "
        "bytes never enter an exchange."
    ),
    "q_html_extract": (
        "HTML boilerplate extraction (r10): the whole strip/decode/"
        "link-density pipeline is ONE map-side projection (Java-regex "
        "chains inside the scan stage) — zero exchanges before the "
        "final order, no Python eval; link_chars is "
        "length(array_join(...)) so the fold stays in codegen (r11)."
    ),
    "q_audio_meta_real": (
        "RIFF chunk-walk audio metadata (r11): ONE MapInPandas kernel "
        "over (doc_id, payload) Arrow batches — no joins, no shuffle "
        "before the final order; the walk hops chunks by declared size, "
        "O(#chunks) per file."
    ),
    "q_image_dhash_real": (
        "Real-file pixel bridge (r11): plant kernel + decode/downsample "
        "kernel (two MapInPandas), then the UNCHANGED JVM dhash64 "
        "projection — no joins, no shuffle before the final order."
    ),
    "q_audio_dedup": (
        "Audio content dedup (r13): ONE MapInPandas kernel plants the "
        "PCM corpus and signs it (byte/bit-identity pytests against the "
        "retained JVM expression law), then image_dedup_pairs' shape "
        "REUSED: four exchange nodes, ZERO joins — only 16 bytes/row "
        "ever cross the Python boundary."
    ),
    "q_video_meta": (
        "MP4 box-walk metadata (r11 depth): ONE MapInPandas kernel; the "
        "walk descends moov/trak/mdia/hdlr/stsd by true header offsets "
        "(16-byte largesize handled), O(#boxes) per file, never mdat."
    ),
    "q_decontaminate": (
        "Benchmark decontamination (r11): the tiny eval-set n-gram "
        "postings BROADCAST and the corpus probes them map-side (one "
        "BroadcastHashJoin, no SortMergeJoin — corpus n-grams never "
        "shuffle); the only wide exchanges are the eval distinct, ONE "
        "per-doc collect_set aggregate over HIT rows (no Expand), and "
        "the final sort."
    ),
    "q_rrf_fusion": (
        "Hybrid-retrieval RRF (r11): each ranker pool lowers to "
        "TakeOrderedAndProject (per-partition heaps, no global sort of "
        "the corpus); rank assignment windows over <=RRF_POOL rows; the "
        "one shuffle is BM25's single-row corpus-stats aggregate; the "
        "fusion full-outer join sorts only the two 50-row pools."
    ),
    "q_audio_pipeline": (
        "Width-aware audio container->content pipeline (r13): ONE "
        "MapInPandas kernel does the whole pass — corpus GENERATION "
        "(_plant_wav, byte-identity-pinned), RIFF walk to the data "
        "slice + declared bits, canonical 16-bit normalization, and "
        "the vectorized numpy signature — so only doc_id enters and "
        "16 bytes/row return to the JVM; the id source is range-"
        "partitioned + sorted BEFORE the map chain (spread_sorted), "
        "so there is NO final sort re-executing it; no joins."
    ),
    "q_video_dedup": (
        "Video temporal-signature dedup (r12): ONE MapInPandas kernel "
        "walks stsz/stsc/stco to the planted frames and emits only 65 "
        "energy longs per video (frame bytes never leave the kernel); "
        "the JVM _pack_sig projection and image_dedup_pairs' shape "
        "REUSED: four exchange nodes, ZERO joins."
    ),
    "q_dedup_exactsubstr": (
        "Byte-level ExactSubstr regions (r12): stride-1 windows are "
        "generated map-side (one transform + posexplode inside the "
        "scan stage), ONE hash aggregation keys the hot set, the join "
        "back is AQE-broadcast, and the islands merge runs under a "
        "doc_id-partitioned window — postings volume is corpus "
        "characters (the suffix array's own input size), never pairs."
    ),
    "q_curate_funnel": (
        "Curation funnel (r12): four stage laws in ONE plan — stage "
        "flags fused into the scan, the exact-dedup groupBy is the "
        "only corpus-keyed exchange, the decon eval postings and both "
        "id-marker frames join as BroadcastHashJoins (no SortMergeJoin "
        "anywhere), and the funnel aggregate runs over the ≤5-rows-"
        "per-doc stage explode — never five per-stage corpus rescans."
    ),
}


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def normalize_plan(plan: str) -> str:
    """Session-independent plan text: strip expression IDs and codegen
    ids so the SAME logical plan hashes identically across sessions —
    the basis of the Plan-hash line that lets a pytest assert PLANS.md
    was regenerated at HEAD (VERDICT r10 #6: the committed audit went
    stale one commit after generation, silently)."""
    plan = re.sub(r" \[codegen id : \d+\]", "", plan)
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    # higher-order-function lambda variables bake a GLOBAL JVM counter
    # into the variable NAME itself (NamedLambdaVariable renders as
    # `lambda x_16#` where 16 is an exprId minted at plan time), so two
    # sessions that planned different queries first disagree on every
    # HOF plan's text — strip the counter exactly like exprIds
    plan = re.sub(r"\blambda (\w+?)_\d+#", r"lambda \1_#", plan)
    # localCheckpoint scans print the RDD id — a global per-context
    # counter, so it too depends on what was planned earlier — and the
    # creation CALLSITE, which the JVM renders as NativeMethodAccessor
    # or <unknown> depending on who drove the py4j call (pytest vs a
    # plain script)
    plan = re.sub(r"RDD\[\d+\]", "RDD[]", plan)
    plan = re.sub(
        r"(RDD\[\] at \w+ at )[^,]+", r"\1<callsite>", plan
    )
    return plan.rstrip()


def plan_hash(plan: str) -> str:
    import hashlib

    return hashlib.sha256(normalize_plan(plan).encode()).hexdigest()[:12]


def _runtime_filter_plan(spark, sf_dir) -> str:
    """q_runtime_filter's registered form returns a materialized
    checkpoint (the scoped confs must be live at PLANNING time), so
    the audit renders the inner join's plan INSIDE the same scope —
    plan phases are lazy, so the string must be forced before the
    confs are restored."""
    from timer_pulsar_spark.operators.relational import (
        _runtime_filter_join,
        runtime_filter_scope,
    )

    with runtime_filter_scope(spark):
        return _explain(_runtime_filter_join(spark, sf_dir))


PLAN_OVERRIDES = {"q_runtime_filter": _runtime_filter_plan}


def main() -> None:
    # the ENGINE's session factory (get_spark), not a vanilla builder:
    # the audit must reflect the conf the engine recommends (broadcast
    # threshold, AQE, parquet pushdown), and the staleness gate in
    # tests/test_plans.py regenerates plans under the same factory —
    # shuffle partitions pinned so hashpartitioning(..., N) text is
    # session-size-independent
    from timer_pulsar_spark.session import get_spark

    spark = get_spark("plans", shuffle_partitions=PLAN_SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    out = [
        "# PLANS — physical-plan audit (generated by scripts/dump_plans.py)",
        "",
        "`explain(\"formatted\")` for the representative operators, captured",
        f"on a vanilla session at {SF_DIR}. Each section states what the",
        "plan must show; regenerate after any plan-shape change.",
        "",
    ]
    for name, claim in AUDITED.items():
        if name in PLAN_OVERRIDES:
            plan = PLAN_OVERRIDES[name](spark, SF_DIR)
        else:
            plan = _explain(qs[name](spark, SF_DIR))
        h = plan_hash(plan)
        # keep the operator tree + the scan details; drop codegen ids noise
        plan = re.sub(r" \[codegen id : \d+\]", "", plan)
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bcast = len(re.findall(r"BroadcastExchange", plan))
        out += [
            f"## {name}",
            "",
            f"**Claim:** {claim}",
            "",
            f"Exchanges: {n_exchange} (of which broadcast: {n_bcast})",
            "",
            f"Plan-hash: `{h}` (normalized: expression/codegen ids "
            "stripped; tests/test_plans.py recomputes this at HEAD)",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
    out += merge_io_audit(spark)
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDITED)} plans + merge I/O audit)")
    spark.stop()


def merge_io_audit(spark) -> list[str]:
    """Measured per-batch I/O of the partition-scoped MERGE (store.py):
    build the minute×bucket task table for one hour, MERGE a one-minute
    status batch, and report how many leaves / bytes were rewritten vs
    the table — the audit behind the claim that a streaming micro-batch
    pays O(batch), not O(history)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.timerdomain import fan_out, minute_timers
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

    work = tempfile.mkdtemp(prefix="merge_audit_")
    try:
        path = os.path.join(work, "tasks")
        tasks = fan_out(
            minute_timers(spark, SF_DIR), "2024-01-01 00:00:00", "2024-01-01 01:00:00"
        )
        write_tasks_partitioned(tasks, path)
        before = inventory(path)
        batch = task_slice_columns(
            tasks.filter(
                F.date_format("run_timer", "yyyy-MM-dd HH:mm") == "2024-01-01 00:05"
            )
        ).withColumn("status", F.lit(2))
        n_batch = batch.count()
        merge_table(spark, path, batch, ["timer_id", "run_timer"],
                    update_matched=True)
        after = inventory(path)
        touched = {l for l in after if before.get(l) != after[l]}
        total_bytes = sum(sz for leaf in before.values() for _, _, sz in leaf)
        touched_bytes = sum(
            sz for l in touched for _, _, sz in after.get(l, [])
        )
        return [
            "## partition-scoped MERGE — measured per-batch I/O",
            "",
            "**Claim:** a one-minute status batch MERGEd into the "
            "minute×bucket task table rewrites only that minute's leaves "
            "(store.merge_table partition scope); every other leaf keeps "
            "its very files. Per-batch I/O is O(touched leaves), so the "
            "1-second streaming status MERGE stays O(batch) as the table "
            "grows to 100 TB.",
            "",
            f"- table: {len(before)} leaves, {total_bytes:,} bytes "
            "(1 h × 10 buckets at sf0.01 fan-out)",
            f"- batch: {n_batch} rows (one minute)",
            f"- leaves rewritten: {len(touched)} "
            f"({sorted(touched)[:3]}…), {touched_bytes:,} bytes "
            f"= {100 * touched_bytes / total_bytes:.1f}% of the table",
            f"- untouched leaves byte-identical: "
            f"{all(before[l] == after[l] for l in set(before) - touched)}",
            "",
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

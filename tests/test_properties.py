"""Property-based tests (hypothesis) for the algorithmic operators
whose correctness is an invariant, not a fixture: BPE training/encoding
consistency and salted-join equivalence hold for ALL inputs, so they
are tested on generated ones, not just the checked-in corpus.

Spark jobs are slow relative to hypothesis's defaults: examples are
capped and deadlines disabled (the suite's job, not per-example
latency, is the budget)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.text(alphabet="abcde", min_size=1, max_size=6)
corpora = st.lists(
    st.lists(words, min_size=1, max_size=8), min_size=1, max_size=12
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora)
def test_bpe_merge_fold_matches_python_reference(spark, docs):
    """The codegen left-to-right merge fold must agree with a plain
    Python reference implementation of non-overlapping pair merging,
    for an arbitrary merge rule applied to arbitrary words."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.textops import bpe_encode

    flat = sorted({w for d in docs for w in d})
    df = spark.createDataFrame([(w,) for w in flat], "w string").withColumn(
        "syms", F.expr("split(w, '')")
    )
    # merge rule: the first two distinct chars of the first word
    chars = [c for c in flat[0]]
    a, b = (chars[0], chars[1]) if len(chars) >= 2 else (chars[0], chars[0])
    got = {
        r["w"]: list(r["syms"])
        for r in bpe_encode(df, [(a, b, 1)]).collect()
    }

    def ref_merge(symbols, a, b):
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        return out

    for w in flat:
        assert got[w] == ref_merge(list(w), a, b), (w, a, b)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora)
def test_bpe_pair_counter_uses_nonoverlap_rule(spark, docs):
    """The trainer's pair counter must count exactly the occurrences
    the merge fold would collapse: left-to-right non-overlapping —
    a run of k equal symbols yields floor(k/2) self-pairs, not k-1."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.textops import _PAIR_FOLD

    flat = sorted({w for d in docs for w in d})
    df = spark.createDataFrame([(w,) for w in flat], "w string").withColumn(
        "syms", F.expr("split(w, '')")
    )
    got = {}
    for r in df.select("w", F.explode(F.expr(_PAIR_FOLD)).alias("p")).collect():
        got.setdefault(r["w"], []).append((r["p"]["a"], r["p"]["b"]))

    def ref_pairs(symbols):
        out, i = [], 0
        # for each candidate pair independently, occurrences are
        # non-overlapping left-to-right; equivalent single-scan form:
        # emit (s[i], s[i+1]) unless it is the odd continuation of an
        # equal-symbol run
        run = 1
        for i in range(1, len(symbols)):
            run = run + 1 if symbols[i] == symbols[i - 1] else 1
            if symbols[i] != symbols[i - 1] or run % 2 == 0:
                out.append((symbols[i - 1], symbols[i]))
        return out

    for w in flat:
        assert got.get(w, []) == ref_pairs(list(w)), w


def test_bpe_mass_exact_with_self_overlapping_winner(spark):
    """A corpus where a self-adjacent pair (a,a) wins rounds: the mass
    drop per round must equal the counted pair weight (adjacency
    counting would claim 2 for 'aaa' and break the invariant)."""
    from pyspark.sql import functions as F

    import timer_pulsar_spark.operators.textops as textops

    doc = spark.createDataFrame(
        [(1, "aaa bb aaa"), (2, "aaaa cc")], "doc_id long, text string"
    )
    orig = textops.load_table
    textops.load_table = lambda s, d, t: doc
    try:
        merges, words = textops.bpe_train(spark, "ignored", rounds=4)
        base = doc.select(F.explode(F.expr("split(text, ' ')")).alias("w")) \
            .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")) \
            .withColumn("syms", F.expr("split(w, '')"))
        base_mass = base.select(
            F.sum(F.size("syms") * F.col("cnt"))).collect()[0][0]
        final_mass = words.select(
            F.sum(F.size("syms") * F.col("cnt"))).collect()[0][0]
        assert merges and any(a == b for a, b, _ in merges)
        assert base_mass - final_mass == sum(n for _, _, n in merges)
        # encoder replay parity survives batched training
        replay = textops.bpe_encode(base, merges)
        diff = (
            replay.select("w", F.col("syms").alias("r"))
            .join(words.select("w", "syms"), "w")
            .filter(F.col("r") != F.col("syms"))
            .count()
        )
        assert diff == 0
    finally:
        textops.load_table = orig


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=0,
        max_size=30,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=0,
        max_size=10,
    ),
    n_salts=st.integers(2, 5),
)
def test_salted_join_equals_plain_join(spark, left, right, n_salts):
    """salted_join must return exactly the plain inner join's multiset
    of rows for arbitrary key distributions (duplicates, empty sides,
    missing keys) and any salt count."""
    from timer_pulsar_spark.operators.relational import salted_join

    ldf = spark.createDataFrame(left or [(99, 0)], "k long, lv long")
    rdf = spark.createDataFrame(right or [(98, 0)], "k long, rv long")
    got = sorted(
        map(tuple, salted_join(ldf, rdf, ["k"], n_salts=n_salts).collect())
    )
    want = sorted(map(tuple, ldf.join(rdf, "k").collect()))
    assert got == want


# ---------------------------------------------------------------------------
# TTL-eviction stateful fold: split-independence + timer-timing-independence
# ---------------------------------------------------------------------------


class _FakeGroupState:
    """Pure-Python stand-in for applyInPandasWithState's GroupState:
    drives the exact generator the stream runs, no Spark."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None
        self.timeout_ms = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _ttl_reference(evs_us, ttl_us):
    """Full-event-time-order gap segmentation: (seg_start, n, total)."""
    ref = []
    seg = None
    for t, v in sorted(evs_us):
        if seg is None or t - seg[1] > ttl_us:
            if seg is not None:
                ref.append((seg[0], seg[2], seg[3]))
            seg = [t, t, 1, v]
        else:
            seg[1], seg[2], seg[3] = t, seg[2] + 1, seg[3] + v
    if seg is not None:
        ref.append((seg[0], seg[2], seg[3]))
    return sorted(ref)


def _drive_ttl_fold(batches, eager_timers, wm_delay_ms):
    """Deliver (t_us, value) batches through _ttl_evict_fn with
    Spark's watermark/timer discipline; return emitted segment set."""
    import pandas as pd

    from timer_pulsar_spark.streaming.stateful import _ttl_evict_fn

    state = _FakeGroupState()
    emitted = []

    def run(pdfs):
        for out in _ttl_evict_fn((7,), pdfs, state):
            for _i, r in out.iterrows():
                emitted.append(
                    (
                        int(pd.Timestamp(r.seg_start).value // 1000),
                        int(r.n_events),
                        float(r.total),
                    )
                )

    watermark_ms = None
    for batch in batches:
        if (
            eager_timers
            and state.exists
            and watermark_ms is not None
            and state.timeout_ms is not None
            and watermark_ms > state.timeout_ms
        ):
            state.hasTimedOut = True
            run(iter(()))
            state.hasTimedOut = False
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([t for t, _v in batch], unit="us"),
                "value": [v for _t, v in batch],
            }
        )
        run(iter((pdf,)))
        hi = max(t for t, _v in batch) // 1000
        watermark_ms = max(watermark_ms or 0, hi - wm_delay_ms)
    while state.exists:
        state.hasTimedOut = True
        run(iter(()))
        state.hasTimedOut = False
    return sorted(emitted)


# gap grid that stresses the TTL boundary (TTL = 60 min = 3,600 s):
# the (TTL, TTL+delay] band is where the old single-segment fold's
# inline eviction was premature (bridgeable by admissible stragglers);
# 7100-7201 stress the same band when delay = TTL (ADVICE r07)
_TTL_GAPS_SEC = [0, 1, 30, 59, 60, 61, 3599, 3600, 3601, 3630, 3659, 3660, 3661, 7100, 7199, 7200, 7201, 7300]


@settings(max_examples=120, deadline=None)
@given(
    gaps=st.lists(st.sampled_from(_TTL_GAPS_SEC), min_size=1, max_size=18),
    jitter_fracs=st.lists(
        st.sampled_from([0.0, 0.001, 0.5, 0.99, 1.0]),
        min_size=18,
        max_size=18,
    ),
    splits=st.sets(st.integers(min_value=1, max_value=17), max_size=6),
    eager_timers=st.booleans(),
    delay_min=st.sampled_from([1, 10, 60]),
)
def test_ttl_evict_fold_exact_under_watermark_bounded_disorder(
    gaps, jitter_fracs, splits, eager_timers, delay_min
):
    """VERDICT r06 gap + ADVICE r07: events are permuted ACROSS batches
    within the watermark bound before delivery. Delivery order = sort
    by (event_time + jitter) with jitter <= the wiring's watermark
    delay — exactly the reorderings Spark can admit (when an event is
    delivered, everything delivered before it is at most delay ahead,
    so the event clears the watermark). The delay itself is drawn from
    {1 min, 10 min, TTL}: the fold's contract is exactness for EVERY
    wiring delay <= TTL, not just the 1-minute default — the pre-r08
    data-confirmed early flush compared against the hardcoded 1-minute
    constant and evicted prematurely under larger (still admissible)
    delays. For every such order, batch split, delay, and timer
    timing, the fold must emit the identical segmentation a full-order
    replay produces — including stragglers that bridge a gap in
    (TTL, TTL+delay] which the pre-r07 single-segment fold had already
    split irrevocably."""
    from timer_pulsar_spark.streaming.stateful import _TTL_US, TTL_MINUTES

    assert delay_min <= TTL_MINUTES  # the wiring invariant under test
    delay_us = delay_min * 60_000_000

    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    evs = [(t * 1_000_000, float(i + 1)) for i, t in enumerate(ts)]

    # watermark-admissible delivery order: arrival = t + jitter
    jitters_us = [int(f * delay_us) for f in jitter_fracs]
    order = sorted(
        range(len(evs)),
        key=lambda i: (evs[i][0] + jitters_us[i], evs[i][0], i),
    )
    delivered = [evs[i] for i in order]

    cut = sorted(i for i in splits if i < len(delivered))
    bounds = [0, *cut, len(delivered)]
    batches = [
        delivered[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ]
    got = _drive_ttl_fold(batches, eager_timers, delay_min * 60_000)
    assert got == _ttl_reference(evs, _TTL_US)


def test_ttl_evict_fold_straggler_bridges_ttl_boundary_gap():
    """Pinned counterexample to the pre-r07 single-segment fold: with
    events at 0s, 3600s, 3659s delivered as [0s], [3659s], [3600s]
    (the 3600s event 60s late — admissible under the 1-minute
    watermark delay), the old fold inline-evicted [0s] on seeing the
    apparent 3659s gap and could never undo the split, emitting two
    segments. Full order has NO >TTL gap (3600 <= TTL, 59 <= TTL):
    the straggler bridges the boundary and the answer is ONE segment
    of all three events."""
    s = 1_000_000
    batches = [
        [(0, 1.0)],
        [(3659 * s, 2.0)],
        [(3600 * s, 4.0)],
    ]
    got = _drive_ttl_fold(batches, eager_timers=False, wm_delay_ms=60_000)
    assert got == [(0, 3, 7.0)]


def test_ttl_evict_fold_straggler_bridges_under_ttl_sized_delay():
    """Pinned counterexample to the pre-r08 early-flush rule (ADVICE
    r07): with a wiring delay of TTL (60 min — admissible per the
    documented contract delay <= TTL), events at 0s, 3600s, 7199s
    delivered as [0s], [7199s], [3600s] (the 3600s event 3,599s late,
    within the delay). The old flush compared against the hardcoded
    1-minute constant: after [7199s] it evicted the 0s segment
    (7199 - 60 > 0 + 3600) although the still-admissible 3600s
    straggler bridges both segments. Full order has NO >TTL gap
    (3600 <= TTL, 3599 <= TTL): the answer is ONE segment."""
    s = 1_000_000
    batches = [
        [(0, 1.0)],
        [(7199 * s, 2.0)],
        [(3600 * s, 4.0)],
    ]
    got = _drive_ttl_fold(batches, eager_timers=False, wm_delay_ms=3_600_000)
    assert got == [(0, 3, 7.0)]


def test_ttl_evict_fold_emits_beyond_bound_straggler_alone():
    """A straggler older than every stored segment's merge window
    (impossible through the watermarked stream, possible when the fold
    is driven directly) must surface as its own segment — never be
    silently merged across a >TTL gap (ADVICE r06)."""
    from timer_pulsar_spark.streaming.stateful import _TTL_US

    h = 3_600_000_000  # 1 hour in µs
    batches = [
        [(0, 1.0)],
        [(10 * h, 2.0)],
        [(5 * h, 4.0)],  # 5 h from both neighbours: > TTL either way
    ]
    got = _drive_ttl_fold(batches, eager_timers=False, wm_delay_ms=60_000)
    assert got == [(0, 1, 1.0), (5 * h, 1, 4.0), (10 * h, 1, 2.0)]
    assert _TTL_US < 5 * h  # the premise: gaps really exceed TTL


_TTL_MIN = st.integers(min_value=0, max_value=600)
_ttl_events = st.lists(
    st.tuples(_TTL_MIN, st.integers(min_value=-5, max_value=5)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(
    events=_ttl_events,
    splits=st.sets(st.integers(min_value=1, max_value=29), max_size=6),
    eager_timers=st.booleans(),
)
def test_ttl_evict_fold_is_split_and_timer_timing_independent(
    events, splits, eager_timers
):
    """The per-key TTL fold must emit exactly the reference gap
    segmentation for ANY time-ordered batch split, and WHETHER an
    eligible eviction timer fires between batches (eager, as Spark
    would once the watermark passes) or only at the end (lazy) must
    not change the result — a gap > TTL is detected inline by the next
    batch if the timer hasn't fired yet. This is the pure-Python drive
    of the exact generator applyInPandasWithState runs; no Spark."""
    import pandas as pd

    from timer_pulsar_spark.streaming.stateful import _TTL_US, _ttl_evict_fn

    # minutes -> microseconds; keep values integral so sums are exact
    evs = sorted(
        (m * 60_000_000, float(v)) for m, v in events
    )

    # reference gap segmentation
    ref = []
    seg = None
    for t, v in evs:
        if seg is None or t - seg[1] > _TTL_US:
            if seg is not None:
                ref.append((seg[0], seg[2], seg[3]))
            seg = [t, t, 1, v]
        else:
            seg[1], seg[2], seg[3] = t, seg[2] + 1, seg[3] + v
    ref.append((seg[0], seg[2], seg[3]))
    ref = sorted(ref)

    state = _FakeGroupState()
    emitted = []

    def run(pdfs):
        for out in _ttl_evict_fn((7,), pdfs, state):
            for _i, r in out.iterrows():
                emitted.append(
                    (
                        int(pd.Timestamp(r.seg_start).value // 1000),
                        int(r.n_events),
                        float(r.total),
                    )
                )

    cut = sorted(i for i in splits if i < len(evs))
    bounds = [0, *cut, len(evs)]
    batches = [
        evs[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ]
    watermark_ms = None
    for batch in batches:
        if (
            eager_timers
            and state.exists
            and watermark_ms is not None
            and state.timeout_ms is not None
            and watermark_ms > state.timeout_ms
        ):
            state.hasTimedOut = True
            run(iter(()))
            state.hasTimedOut = False
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([t for t, _v in batch], unit="us"),
                "value": [v for _t, v in batch],
            }
        )
        run(iter((pdf,)))
        # Spark's watermark: max event time seen minus the 1-min delay
        hi = max(t for t, _v in batch) // 1000
        watermark_ms = max(watermark_ms or 0, hi - 60_000)
    # closing watermark passes every pending timer (the sentinel's job)
    while state.exists:
        state.hasTimedOut = True
        run(iter(()))
        state.hasTimedOut = False

    assert sorted(emitted) == ref

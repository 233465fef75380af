"""Streaming dedup and stream-stream join (SURVEY §2c streaming row).

Two more Structured Streaming operator families beyond windowed aggs
(streaming/windows.py) and arbitrary state (streaming/stateful.py):

- ``dropDuplicatesWithinWatermark``: state-bounded streaming dedup —
  state for a key is dropped once the watermark passes its event time,
  so state is O(keys-in-watermark-window), not O(stream length). Over
  a drained finite replay the result equals batch DISTINCT.
- Stream-stream inner join with an event-time range condition: both
  sides carry watermarks so Spark can bound the join state buffer;
  the range condition tells it how long a left row can still match.

Both are drained with availableNow into a memory sink (streaming/
source.py) so they participate in the batch oracle protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.registry import register
from minimapreduce_spark.streaming.source import events_stream, run_to_memory


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on (user_id, event_type) with watermark-bounded
    state: the first event per key is emitted, later duplicates inside
    the watermark horizon are dropped, and the key's state is evicted
    once the watermark passes — the streaming form of dedup_exact that
    never accumulates unbounded state."""
    sdf = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = sdf.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(deduped, "stream_dedup_watermark", "append")


@register(
    "stream_view_purchase_join",
    oracle="""
    SELECT v.user_id,
           v.event_id  AS view_id,
           p.event_id  AS purchase_id,
           v.ts        AS view_ts,
           p.ts        AS purchase_ts
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the views
    by the same user in the preceding hour. Watermarks on both sides +
    the time-range join condition let Spark evict buffered rows once
    they can no longer match — bounded state on an unbounded stream."""
    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + INTERVAL 1 HOUR
            """
        ),
    )
    out = run_to_memory(joined, "stream_view_purchase_join", "append")
    return out.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


@register(
    "stream_exactly_once_ingest",
    # NOT bench=True: the watermarked sibling below is the benched
    # exactly-once headliner (round-6 verdict item 6) — its bounded
    # ledger is the only 100 TB-deployable plan; this unbounded-ledger
    # variant stays registered as the teaching twin
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_c_sum
    FROM events
    GROUP BY event_type
    """,
)
def stream_exactly_once_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion from an AT-LEAST-ONCE source: the staged
    replay redelivers every 13th event into EVERY micro-batch (consumer
    retry/failover, see ``events_stream_redelivered``), and streaming
    ``dropDuplicates`` on the idempotency key collapses the copies
    across batches — so the drained sink equals the clean batch table,
    which is exactly what the oracle checks (a consumer that merely
    counted rows would overcount by the planted redelivery volume).

    State posture: the dedup ledger holds one entry per event_id — the
    unavoidable price of exactly-once over a keyless-commit source; a
    source whose redelivery horizon is time-bounded can swap in
    ``dropDuplicatesWithinWatermark`` (see ``stream_dedup_watermark``)
    to evict ledger entries as the watermark passes. Sums are 1e-4
    fixed-point BIGINTs per the repo's exactness discipline."""
    from minimapreduce_spark.streaming.source import events_stream_redelivered

    sdf = events_stream_redelivered(spark, sf_dir)
    deduped = sdf.dropDuplicates(["event_id"]).select(
        "event_id", "event_type", "value"
    )
    drained = run_to_memory(deduped, "stream_exactly_once_ingest", "append")
    return drained.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("bigint")).alias("value_c_sum"),
    )


# watermark delay for the bounded-ledger consumer: must cover the
# source's redelivery horizon (one slice of the 30-day fixture at 10
# slices = 3 days = 72 h) with margin, and nothing more — the delay IS
# the state bound. dropDuplicatesWithinWatermark keeps a key until the
# watermark passes event_time + delay, and the watermark itself lags
# one micro-batch, so the live ledger window is ~(2·delay + batch
# span). Round 12 trims 96 h → 84 h (horizon + 12 h margin; the staged
# replay's horizon is exact, so correctness needs only delay > 72 h —
# verified output-exact at all three SFs) to keep the window bounded
# when batch coalescing below widened the span: the two knobs together
# give ~(2·3.5 + 6) = 13 of 30 days, peaking at 47.2% of keys
# (sf0.001) / 43.5% (sf0.01, sf0.1) vs the eviction pytest's pinned
# <50% contract — the completeness/state/latency dial the docstring
# names, turned under the same contract.
EXACTLY_ONCE_WM_DELAY = "84 hours"

# Source files consumed per micro-batch by the exactly-once drain's
# reader — the CONSUMER's trigger sizing, NOT the source's slice/
# redelivery contract (the staged slices and their one-slice
# redelivery horizon are unchanged; dedup correctness needs only
# delay ≥ horizon, which holds at any batching). Round-12 measurement
# (tools/stream_ab_probe.py, interleaved same-session at sf0.1):
# per-micro-batch FIXED cost dominated the drain — 2 files/trigger
# (5 data batches) took it 4.7 → 2.7 s at every state width probed,
# while 1→2 is the whole win (state width 8/4/2 all within noise at
# either setting). Decomposition: a stateless drain of the same source
# costs ~0.23 s/batch (planning + WAL + sink) and the dedup state adds
# ~0.27 s/batch — both scale with batch count, neither with width.
# The price is a higher in-flight ledger peak (see the delay note
# above); 3 files/trigger peaks at 57% under the 96 h delay and is
# excluded by the <50% contract. At production throughput batch sizing
# is the same knob: amortize per-batch fixed costs subject to the
# state ceiling.
EXACTLY_ONCE_FILES_PER_TRIGGER = 2

# Slices in the staged replay (events_stream_time_sliced_redelivered's
# default) — batches = ceil(slices / files_per_trigger).
EXACTLY_ONCE_N_SLICES = 10


def _exactly_once_state_width(spark: SparkSession, sf_dir: str) -> int:
    """State shards derived from per-batch volume (round-11 verdict
    item 4 — the constant 8 was a fixture tune): rows per micro-batch
    = staged events (footer metadata, no job) / batch count, through
    the shared ``stream_state_width`` sizing."""
    import math

    from minimapreduce_spark.catalog import parquet_rowcount, table_path
    from minimapreduce_spark.session import stream_state_width

    n_batches = math.ceil(EXACTLY_ONCE_N_SLICES / EXACTLY_ONCE_FILES_PER_TRIGGER)
    rows = parquet_rowcount(table_path(sf_dir, "events"))
    return stream_state_width(spark, rows // max(1, n_batches))


def exactly_once_watermarked_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming plan behind ``stream_exactly_once_watermarked``,
    exposed unfinalized so the state-eviction pytest can drain it with
    its own listener-equipped query and read stateOperators metrics."""
    from minimapreduce_spark.streaming.source import (
        events_stream_time_sliced_redelivered,
    )

    sdf = events_stream_time_sliced_redelivered(
        spark, sf_dir, files_per_trigger=EXACTLY_ONCE_FILES_PER_TRIGGER
    )
    return (
        sdf.withWatermark("ts", EXACTLY_ONCE_WM_DELAY)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )


@register(
    "stream_exactly_once_watermarked",
    bench=True,  # the exactly-once headliner: bounded-ledger, 100 TB-deployable
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_c_sum
    FROM events
    GROUP BY event_type
    """,
)
def stream_exactly_once_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion with a BOUNDED dedup ledger (round-4
    verdict item 7): the source replays time-sliced micro-batches whose
    redelivery horizon is at most one slice width
    (``events_stream_time_sliced_redelivered``), so
    ``dropDuplicatesWithinWatermark`` holds state only for event_ids
    inside the ``EXACTLY_ONCE_WM_DELAY`` watermark window and EVICTS a
    key once the watermark passes event_time + delay — O(events-per-
    horizon) state versus the full-ledger sibling
    ``stream_exactly_once_ingest``'s O(stream). Correctness needs the
    delay ≥ redelivery horizon (copies land while their key's state is
    still live AND above the watermark, so nothing is late-dropped;
    originals are never late because slices arrive in time order) —
    then the drained sink equals the clean batch table, which is what
    the oracle checks. The planted-redelivery pytest asserts both the
    dedup (sink equals batch DISTINCT despite nonzero redelivery) and
    the eviction (max stateOperators rows stays well under the stream's
    distinct-key count).

    State-store SIZING (round-7 verdict item 5, measured; round-12:
    DERIVED from batch volume): the wall of this drain is per-batch
    FIXED cost — trigger planning, WAL, and one state-store commit per
    partition per batch — not dedup work. Profiled at sf0.1: 32 state
    partitions → 10.3-15.5 s; 8 → 4.7 s (round 7); and with the width
    question settled, batching is the remaining fixed-cost knob —
    2 files/trigger → 2.7 s (round 12, see
    EXACTLY_ONCE_FILES_PER_TRIGGER). The state width is now DERIVED
    from per-batch volume via the shared ``stream_state_width`` sizing
    (``_exactly_once_state_width``) instead of a fixture constant —
    the real deployment discipline: state shards scale with streaming
    throughput (clamped by the cluster width), never with the batch
    session's shuffle width. Dedup is partition-count invariant
    (pytest-pinned repo-wide); SCALING.md carries the timing tables."""
    # Scope the state-partition override to the CACHED per-(context,
    # width) session clone (shares the SparkContext; isolated SQLConf),
    # so nothing else running on the caller's session concurrently can
    # inherit the 8-partition setting mid-drain (round-8 ADVICE), and
    # repeated invocations reuse one clone instead of leaking sessions
    # (round-9 ADVICE; session.narrow_clone).
    from minimapreduce_spark.session import narrow_clone

    s2 = narrow_clone(spark, _exactly_once_state_width(spark, sf_dir))
    # Skip the trailing no-data micro-batch for THIS drain (round-11,
    # measured ~0.3-0.5 s of the wall): dropDuplicatesWithinWatermark
    # emits each first-seen row in the batch it arrives, so the
    # no-data batch only advances the watermark for one extra round of
    # state EVICTION after the last data batch — output-invariant for
    # an availableNow drain that discards state at termination anyway.
    # Scoped set/restore on the shared clone: windowed-agg queries in
    # append mode DO need no-data batches to flush final windows, so
    # the flag must not leak to other clone users.
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = s2.conf.get(key, "true")
    s2.conf.set(key, "false")
    try:
        drained = run_to_memory(
            exactly_once_watermarked_plan(s2, sf_dir),
            "stream_exactly_once_watermarked",
            "append",
        )
    finally:
        s2.conf.set(key, prev)
    return drained.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("bigint")).alias("value_c_sum"),
    )


@register(
    "stream_left_outer_views",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS view_ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      -- the GLOBAL watermark: Spark's multi-watermark policy is the
      -- MIN across inputs, each computed on its own filtered stream —
      -- with each side's max FLOORED TO MILLISECONDS first (Spark
      -- tracks watermarks in ms; on a µs-grained fixture an unfloored
      -- max would finalize rows Spark still withholds — the
      -- stream_sessions_timer_finalized oracle's discipline)
      SELECT least(
               make_timestamp((epoch_us((SELECT max(view_ts) FROM v))
                               // 1000) * 1000),
               make_timestamp((epoch_us((SELECT max(purchase_ts) FROM p))
                               // 1000) * 1000)
             ) - INTERVAL 2 HOUR AS wm
    )
    SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.purchase_ts >= v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT v.user_id, v.view_id, NULL, v.view_ts, NULL
    FROM v, m
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = v.user_id
        AND p.purchase_ts >= v.view_ts
        AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    )
    AND v.view_ts + INTERVAL 1 HOUR < m.wm
    """,
)
def stream_left_outer_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the missing join semantic after
    the inner twin (`stream_view_purchase_join`): every view emits,
    matched purchases immediately, and a view with NO purchase in its
    hour emits ONCE with NULL purchase columns — but only after the
    watermark passes the last instant it could still match
    (view_ts + 1 h), because earlier emission could be contradicted by
    a late purchase. This buffered-then-finalized null emission is the
    semantic that makes outer joins deployable on streams at all
    (funnel drop-off detection, abandoned-cart feeds, SLA breach
    alerts — all "X happened and Y did NOT follow" shapes).

    The oracle states the emission contract exactly (the
    `stream_tumbling_append_finalized` discipline): over a drained
    finite replay the output is the batch left join MINUS the
    unmatched views still inside the un-finalizable tail — those with
    view_ts + 1 h ≥ the global watermark, i.e. min over both sides of
    (that side's max event time) − 2 h (Spark's multi-watermark MIN
    policy; the full-outer twin's sf0.01 boundary measurement is what
    pinned min-vs-max), withheld BY DESIGN. Matched pairs are
    identical to the inner twin's.

    Scale posture: identical state bound to the inner join — both
    sides' buffers evicted by watermark + the range condition; the
    null-emission adds no state, only an eviction-time emission. At
    100 TB the watermark delay is the single knob trading completeness
    against state size and result latency."""
    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + INTERVAL 1 HOUR
            """
        ),
        "leftOuter",
    )
    out = run_to_memory(joined, "stream_left_outer_views", "append")
    return out.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


@register(
    "stream_full_outer_view_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS view_ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      -- the GLOBAL watermark: Spark's multi-watermark policy is the
      -- MIN across inputs, each computed on its own filtered stream —
      -- with each side's max FLOORED TO MILLISECONDS first (Spark
      -- tracks watermarks in ms; on a µs-grained fixture an unfloored
      -- max would finalize rows Spark still withholds — the
      -- stream_sessions_timer_finalized oracle's discipline)
      SELECT least(
               make_timestamp((epoch_us((SELECT max(view_ts) FROM v))
                               // 1000) * 1000),
               make_timestamp((epoch_us((SELECT max(purchase_ts) FROM p))
                               // 1000) * 1000)
             ) - INTERVAL 2 HOUR AS wm
    )
    SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.purchase_ts >= v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT v.user_id, v.view_id, NULL, v.view_ts, NULL
    FROM v, m
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = v.user_id
        AND p.purchase_ts >= v.view_ts
        AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    )
    AND v.view_ts + INTERVAL 1 HOUR < m.wm
    UNION ALL
    SELECT p.user_id, NULL, p.purchase_id, NULL, p.purchase_ts
    FROM p, m
    WHERE NOT EXISTS (
      SELECT 1 FROM v
      WHERE v.user_id = p.user_id
        AND p.purchase_ts >= v.view_ts
        AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    )
    AND p.purchase_ts < m.wm
    """,
)
def stream_full_outer_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join — the LAST Structured-Streaming
    join semantic after inner (`stream_view_purchase_join`) and left
    outer (`stream_left_outer_views`): matched view→purchase pairs emit
    immediately; an unmatched VIEW emits once with NULL purchase
    columns after the watermark passes view_ts + 1 h (no purchase can
    still land in its window); an unmatched PURCHASE emits once with
    NULL view columns after the watermark passes purchase_ts (the
    latest event time a matching view could carry — the range
    condition bounds view_ts ≤ purchase_ts). Both NULL finalizations are
    watermark-driven evictions of the same state the inner join already
    buffers — full outer adds emissions, not state.

    The oracle states the emission contract exactly, both tails spelled
    out (the `stream_left_outer_views` discipline): batch full outer
    MINUS unmatched views with view_ts + 1 h ≥ wm and MINUS unmatched
    purchases with purchase_ts ≥ wm, where wm is the GLOBAL watermark =
    min over both sides of (that side's max event time) − 2 h (Spark's
    multi-watermark MIN policy, measured here: the purchase stream's
    max lags the view stream's by ~32 min at sf0.01, and the emission
    boundary tracks the min, not the global max) — each withheld BY
    DESIGN because a late row inside the watermark delay could still
    contradict them. Matched pairs are identical to the inner twin's
    (pinned in pytest, along with both NULL-side sets).

    Why this completes the funnel surface: full outer is the shape of
    reconciliation feeds — "every view AND every purchase, attributed
    where possible" — the two-sided generalization of abandoned-cart
    (left) and orphan-payment (right) detection in one pass.

    Scale posture: state identical to the inner join (watermark + range
    condition evict both buffers); output is |matches| + both
    finalized-unmatched sets, each row emitted exactly once. At 100 TB
    the watermark delay remains the single completeness/state/latency
    knob."""
    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + INTERVAL 1 HOUR
            """
        ),
        "fullOuter",
    )
    out = run_to_memory(joined, "stream_full_outer_view_purchase", "append")
    return out.select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )

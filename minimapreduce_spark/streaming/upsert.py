"""Streaming CDC-style upsert: foreachBatch MERGE into a keyed state
table.

The production pattern this demonstrates: a stream of events
continuously upserts a "latest value per key" serving table. Without a
table format (Delta/Iceberg) the merge is read-modify-publish —
``current state ∪ batch updates → keep latest per key → atomic swap``
(sources.formats.publish_atomic) — which is IDEMPOTENT: a micro-batch
replayed after a crash-restart merges to the identical state, giving
the sink half of exactly-once on top of the checkpoint WAL's source
half. With a table format the body becomes one MERGE INTO; every other
line stays.

The replay is forced through MULTIPLE micro-batches (the staged events
split into shards + ``maxFilesPerTrigger=1``) so the merge loop runs
for real, not as one degenerate batch; the final state is independent
of batch arrival order because "latest by (ts, event_id)" is an
associative, commutative fold.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.registry import register
from minimapreduce_spark.streaming.source import events_stream_sharded

STATE_SCHEMA = "user_id bigint, last_ts timestamp, last_event_id bigint, last_value double"


def _latest_per_user(df: DataFrame) -> DataFrame:
    """Deterministic latest row per user: max (ts, event_id) pair —
    an aggregation (max of a packed struct), not a rank window, so it
    needs one shuffle and O(1) state per key."""
    return df.groupBy("user_id").agg(
        F.max(F.struct("last_ts", "last_event_id", "last_value")).alias("m")
    ).select(
        "user_id",
        F.col("m.last_ts").alias("last_ts"),
        F.col("m.last_event_id").alias("last_event_id"),
        F.col("m.last_value").alias("last_value"),
    )


@register(
    "stream_upsert_latest_state",
    oracle="""
    SELECT user_id, last_ts, last_event_id, last_value FROM (
      SELECT user_id,
             ts AS last_ts,
             event_id AS last_event_id,
             round(value, 4) AS last_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    bench=True,  # times the full 4-micro-batch CDC MERGE replay
)
def stream_upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-merged serving table: for every user, the latest
    event (by ts, event_id tie-break) after replaying the event stream
    through 4 micro-batches of foreachBatch MERGE. Equals the batch
    "latest row per key" query — the oracle — whatever order the
    batches land in.

    Scale posture: each micro-batch shuffles only its updates plus the
    (|keys|-bounded) current state on user_id; the swap publishes
    atomically. With Delta/Iceberg the read-modify-publish collapses
    into MERGE INTO and the state table stops being rewritten whole —
    the streaming plan is unchanged.
    """
    from minimapreduce_spark.sources.formats import publish_atomic

    work = os.path.join(
        tempfile.gettempdir(), "minimapreduce_upsert", uuid.uuid4().hex
    )
    state_dir = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(work, exist_ok=True)

    sdf = events_stream_sharded(spark, sf_dir, n_shards=4).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_value"),
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        updates = _latest_per_user(batch_df)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            current = sess.read.schema(STATE_SCHEMA).parquet(state_dir)
            merged = _latest_per_user(current.unionByName(updates))
        else:
            merged = updates
        # Materialize BEFORE the swap: the plan reads the directory the
        # swap is about to replace.
        merged = merged.localCheckpoint(eager=True)
        publish_atomic(merged, state_dir)

    q = (
        sdf.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema(STATE_SCHEMA).parquet(state_dir).localCheckpoint(
        eager=True
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "stream_ann_serve_ivfpq",
    oracle=None,  # set just below via registry surgery-free import: see
    # _set_serve_oracle — the oracle IS the batch served twin's
)
def stream_ann_serve_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE ANN SERVING — the query-stream half of the index
    lifecycle (build → serve → append → SERVE ONLINE): query vectors
    arrive as a real multi-micro-batch stream, and each micro-batch is
    routed/LUT-built/ADC-scored against the PERSISTED IVF-PQ artifact
    (`ivfpq_index_build`) inside ``foreachBatch`` — the streaming
    pattern for per-batch logic that needs rank windows (unsupported
    in pure append streams), and exactly how a micro-batch vector
    search tier works: the index is the static side, queries are the
    stream, scoring is stateless per batch.

    Each query lives in exactly one shard and scoring is
    query-independent, so the drained union over batches equals the
    batch served twin row-for-row — the oracle is `_ivfpq_oracle`
    verbatim (shared with `ann_ivfpq_served_topk`), and the pytest
    additionally pins the multi-batch replay really happened (>1
    non-empty micro-batch) and frame-equality with the batch twin.

    Scale posture: per trigger, work = |batch queries| routed cells
    scanned from the CELL-PARTITIONED codes artifact + bounded
    broadcast codebook/centroid joins; no streaming state at all
    (stateless enrichment — the serving tier's whole point); results
    append to the sink. Latency is the micro-batch trigger, capacity
    is executors × cells-per-second — both independent of index build."""
    import uuid

    from pyspark.sql import functions as F

    from minimapreduce_spark.operators.similarity import (
        KMEANS_SCALE,
        N_QUERIES,
        _ivfpq_serve,
        ivfpq_index_build,
    )
    from minimapreduce_spark.streaming.source import table_stream_sharded

    from minimapreduce_spark.catalog import load_table

    if load_table(spark, sf_dir, "embeddings").head(1) == []:
        # Degenerate-input policy: no corpus → no index, no queries
        return spark.createDataFrame(
            [], "q_vec_id bigint, neighbor_id bigint, ivfpq_sim double, rn int"
        )
    root = ivfpq_index_build(spark, sf_dir)
    cg = spark.read.parquet(os.path.join(root, "centroids"))
    cb = spark.read.parquet(os.path.join(root, "codebook"))
    code_arr = spark.read.parquet(os.path.join(root, "codes")).select(
        "vec_id", F.col("label").cast("int").alias("label"), "code", "n2hat"
    )

    work = os.path.join(
        tempfile.gettempdir(), "minimapreduce_ann_serve", uuid.uuid4().hex
    )
    out_dir = os.path.join(work, "results")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(out_dir, exist_ok=True)
    n_batches = {"nonempty": 0}

    qstream = (
        table_stream_sharded(spark, sf_dir, "embeddings", n_shards=4)
        .where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * KMEANS_SCALE).cast("bigint"),
            ).alias("qe"),
        )
    )

    def serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        n_batches["nonempty"] += 1
        res = _ivfpq_serve(
            batch_df.sparkSession,
            sf_dir,
            cg,
            cb,
            code_arr,
            nprobe=1,
            query_frame=batch_df,
        )
        res.write.mode("append").parquet(out_dir)

    q = (
        qstream.writeStream.foreachBatch(serve_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_ann_serve_ivfpq.last_nonempty_batches = n_batches["nonempty"]
    out = (
        spark.read.schema(
            "q_vec_id bigint, neighbor_id bigint, ivfpq_sim double, rn int"
        )
        .parquet(out_dir)
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


def _set_serve_oracle() -> None:
    """The online serve's oracle IS the batch served twin's (drained
    union over independent per-batch scoring ≡ one batch serve);
    registered after the fact because the oracle text lives in
    operators.similarity and importing it at module top would cycle."""
    from dataclasses import replace

    from minimapreduce_spark.operators.similarity import _ivfpq_oracle
    from minimapreduce_spark.registry import REGISTRY

    REGISTRY["stream_ann_serve_ivfpq"] = replace(
        REGISTRY["stream_ann_serve_ivfpq"], oracle=_ivfpq_oracle()
    )


_set_serve_oracle()

"""Custom stateful streaming via ``applyInPandasWithState``.

The streaming generalization of the reference's Reduce UDAF
(mr/worker.go:146: arbitrary per-key aggregation): user Python holds
per-key state in the state store across micro-batches and emits updated
aggregates. Arrow-batched — the grouped rows arrive as pandas frames,
never row-at-a-time.

Over a drained finite stream the final state equals a batch groupBy, so
the DuckDB oracle applies — a custom stateful operator with a full
correctness oracle, not just a rows-only check.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from minimapreduce_spark.registry import register
from minimapreduce_spark.streaming.source import events_stream, run_to_memory

_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n bigint, total double, max_v double"


def _user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into running (n, total, max)."""
    n, total, max_v = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            total += float(pdf["value"].sum())
            max_v = max(max_v, float(pdf["value"].max()))
    state.update((n, total, max_v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [max_v],
        }
    )


@register(
    "stream_user_stats_stateful",
    oracle="""
    SELECT user_id,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value,
           max(value)           AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_user_stats_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime stats maintained in the state store by a
    Python stateful operator. State is partitioned by user_id across
    executors (RocksDB-backed in production); emission is per-batch
    'update' rows, so the drained result is the final per-user state."""
    sdf = events_stream(spark, sf_dir)
    updates = sdf.groupBy("user_id").applyInPandasWithState(
        _user_stats,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(updates, "stream_user_stats_stateful", "update")

"""Structured Streaming operators: oracle matches + streaming-specific
invariants (streaming-vs-batch golden diff — the reference's
distributed-vs-sequential protocol, main/test-mr.sh:59-67, lifted to
streams)."""

import pytest

from tests.conftest import SF_DIR, assert_frames_match, run_and_compare

STREAMING = [
    "stream_tumbling_hourly",
    "stream_session_window",
    "stream_user_stats_stateful",
]


@pytest.mark.parametrize("name", STREAMING)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_stream_equals_batch_tumbling(spark):
    """The streaming tumbling window must equal the batch twin on the
    same data — replay determinism."""
    from minimapreduce_spark import queries as q

    s = q.queries()["stream_tumbling_hourly"](spark, SF_DIR).toPandas()
    b = q.queries()["events_tumbling_hourly"](spark, SF_DIR).toPandas()
    assert_frames_match(
        s.rename(columns={"hour_start": "hour_start"}),
        b.rename(columns={"hour_start": "hour_start"}),
        name="stream-vs-batch tumbling",
    )


def test_stream_source_is_streaming(spark):
    from minimapreduce_spark.streaming.source import events_stream

    sdf = events_stream(spark, SF_DIR)
    assert sdf.isStreaming
    assert dict(sdf.dtypes)["ts"] == "timestamp"

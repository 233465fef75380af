"""Partition-invariance gate (the reference's n_reduce contract,
main/test-mr.sh protocol): a query's VALUES may not depend on how many
partitions computed them. Runs the newest/statistics-heavy operators
under two different shuffle widths in two separate SparkSessions and
compares order-insensitive value hashes."""

from __future__ import annotations

import hashlib

from minimapreduce_spark import queries as q
from minimapreduce_spark.session import get_spark
from tests.conftest import SF_DIR

CANDIDATES = [
    "events_user_entropy",
    "events_cusum_changepoint",
    "events_autocorrelation_lag1",
    "weighted_median_price",
    "gini_revenue_inequality",
    "pareto_revenue_concentration",
    "ts_similarity_topk",
    "window_rolling_median",
    "agg_mad_user_value",
    "ols_slope_value_vs_time",
]


def _hashes(parts: int) -> dict[str, str]:
    spark = get_spark(
        app_name=f"pinv{parts}", master="local[4]", shuffle_partitions=parts
    )
    out = {}
    try:
        for name in CANDIDATES:
            pdf = q.queries()[name](spark, SF_DIR).toPandas()
            pdf = pdf[sorted(pdf.columns)]
            out[name] = hashlib.sha256(
                "\n".join(
                    sorted(
                        ",".join(repr(v) for v in r)
                        for r in pdf.itertuples(index=False)
                    )
                ).encode()
            ).hexdigest()
    finally:
        spark.stop()
    return out


def test_values_invariant_under_shuffle_width():
    a = _hashes(2)
    b = _hashes(8)
    diffs = [n for n in CANDIDATES if a[n] != b[n]]
    assert not diffs, f"partition-dependent results: {diffs}"

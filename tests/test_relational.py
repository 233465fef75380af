"""Relational + events operator suite vs the DuckDB oracle (SURVEY §2c)."""

import pytest

from tests.conftest import run_and_compare

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "filter_project",
    "join_broadcast_dims",
    "join_left_order_counts",
    "join_semi_big_spenders",
    "join_anti_no_urgent",
    "agg_distinct_priority",
    "agg_rollup_lineitem",
    "agg_cube_orders",
    "agg_conditional_pivot",
    "stats_summary",
    "window_running_spend",
    "window_topk_per_customer",
    "window_order_gaps",
    "topk_global_lineitems",
    "set_ops_customers",
    "scalar_functions_showcase",
    "correlated_above_avg_spend",
]

EVENTS = [
    "events_json_extract",
    "events_tumbling_hourly",
    "events_sliding_1h_30m",
    "events_sessionization",
    "events_asof_join",
    "events_range_join",
]


@pytest.mark.parametrize("name", RELATIONAL + EVENTS)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_q3_is_nonempty(spark):
    from minimapreduce_spark import queries as q

    assert q.queries()["q3_shipping_priority"](spark, "/root/testdata/sf0.001").count() > 0


def test_anti_semi_are_nonempty(spark):
    from minimapreduce_spark import queries as q

    for name in ("join_semi_big_spenders", "join_anti_no_urgent", "events_asof_join"):
        assert q.queries()[name](spark, "/root/testdata/sf0.001").count() > 0, name

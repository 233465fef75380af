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
    "agg_salted_skew",
    "join_salted_suppliers",
    "agg_grouping_sets",
    "join_bloom_pruned_revenue",
    "agg_mode_deterministic",
    "map_agg_event_counts",
]

EVENTS = [
    "events_json_extract",
    "events_tumbling_hourly",
    "events_sliding_1h_30m",
    "events_sessionization",
    "events_asof_join",
    "events_range_join",
    "events_resample_gapfill",
    "events_attribution_last_touch",
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


def test_approx_sketch_error_bounds(spark, duck):
    """The banded oracle compresses error checks into booleans; this
    pins the tighter raw bounds: every band flag true, and Spark's
    exact distinct counts equal DuckDB's (the hash-compared columns)."""
    from minimapreduce_spark import queries as q
    from tests.conftest import SF_DIR

    got = {r.l_returnflag: r for r in q.queries()["agg_approx_sketch"](spark, SF_DIR).collect()}
    exact = duck.execute("""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS n_orders,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """).df()
    assert len(got) == len(exact)
    for _, row in exact.iterrows():
        g = got[row.l_returnflag]
        assert g.exact_orders == row.n_orders
        assert g.n_rows == row.n_rows
        assert g.hll_within_5pct and g.p50_banded and g.p95_banded, g

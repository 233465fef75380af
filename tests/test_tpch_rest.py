"""Remaining TPC-H shapes (Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21/Q22)
vs the DuckDB oracle, plus non-emptiness sanity on the selective ones."""

import pytest

from tests.conftest import run_and_compare

QUERIES = [
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_parts",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity_revenue",
    "q20_excess_share_suppliers",
    "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity",
]


@pytest.mark.parametrize("name", QUERIES)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


@pytest.mark.parametrize(
    "name",
    # Selective predicates can silently degenerate to empty results as the
    # synthetic data drifts; assert the interesting ones actually select rows.
    ["q2_min_cost_supplier", "q7_volume_shipping", "q13_customer_order_distribution",
     "q15_top_supplier", "q21_suppliers_kept_waiting"],
)
def test_nonempty(spark, name):
    from minimapreduce_spark.registry import REGISTRY
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    assert REGISTRY[name].fn(spark, sf_dir).limit(1).count() == 1

"""UDF/UDAF/UDTF surface: oracle matches + Arrow-batching sanity."""

import pytest

from tests.conftest import SF_DIR, run_and_compare

ORACLED = [
    "udf_vectorized_sigmoid",
    "udaf_weighted_discount",
    "udtf_split_sentences",
    "cogroup_customer_activity",
]


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_udtf_rows_expand(spark):
    """UDTF is one-to-many: output rows ≥ input docs with text."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import load_table

    out = q.queries()["udtf_split_sentences"](spark, SF_DIR)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert out.count() >= n_docs
    assert out.columns == ["doc_id", "sent_no", "sentence"]

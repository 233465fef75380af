"""Reference-app queries (SURVEY §2b) vs the DuckDB oracle."""

import pytest

from tests.conftest import run_and_compare


@pytest.mark.parametrize(
    "name",
    ["wordcount", "inverted_index", "crash_agg", "distinct_words_per_doc"],
)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_wordcount_nonempty_and_schema(spark):
    from minimapreduce_spark import queries as q

    df = q.queries()["wordcount"](spark, "/root/testdata/sf0.001")
    assert df.columns == ["word", "cnt"]
    assert df.count() > 0

"""Training-data pipeline operators vs the DuckDB oracle, plus
split-determinism properties the oracle can't express."""

import os

import pytest

from tests.conftest import run_and_compare

QUERIES = [
    "split_train_test",
    "sample_stratified",
    "text_pii_scrub",
    "text_quality_repetition",
    "merge_upsert_customers",
    "percentile_quantity",
    "histogram_order_prices",
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", QUERIES)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_split_fractions_and_stability(spark):
    """The hash split must (a) be reproducible run-to-run, (b) cover
    every doc exactly once, (c) land near 80/10/10."""
    from minimapreduce_spark.registry import REGISTRY

    fn = REGISTRY["split_train_test"].fn
    a = {r["doc_id"]: r["split"] for r in fn(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["split"] for r in fn(spark, SF_DIR).collect()}
    assert a == b, "split assignment must be deterministic"
    n = len(a)
    train = sum(1 for s in a.values() if s == "train") / n
    test = sum(1 for s in a.values() if s == "test") / n
    assert 0.70 <= train <= 0.90, train
    assert 0.03 <= test <= 0.18, test


def test_split_partition_invariance(spark):
    """Assignment must not depend on physical partitioning — the
    property that lets a 100 TB re-run on a different cluster keep the
    same split."""
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import _hash2
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    h1 = docs.select("doc_id", _hash2(F.col("doc_id")).alias("h"))
    h32 = docs.repartition(32).select("doc_id", _hash2(F.col("doc_id")).alias("h"))
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h32.collect()))


def test_pii_scrub_removes_all_pii(spark):
    import re

    from minimapreduce_spark.registry import REGISTRY

    rows = REGISTRY["text_pii_scrub"].fn(spark, SF_DIR).collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\d{3}[-.]\d{4}")
    assert rows
    for r in rows:
        assert "<EMAIL>" in r["scrubbed"]
        assert "<PHONE>" in r["scrubbed"]
        assert not email.search(r["scrubbed"]), r["scrubbed"]
        assert not phone.search(r["scrubbed"]), r["scrubbed"]


def test_merge_actions_present(spark):
    from minimapreduce_spark.registry import REGISTRY

    acts = {
        r["action"]
        for r in REGISTRY["merge_upsert_customers"].fn(spark, SF_DIR).collect()
    }
    assert acts == {"insert", "update", "keep"}, acts

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


def test_bm25_matches_oracle(spark, duck):
    from tests.conftest import run_and_compare

    run_and_compare(spark, duck, "text_bm25_topk")


def test_bm25_scores_positive_and_ranked(spark):
    import os

    from minimapreduce_spark.registry import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = REGISTRY["text_bm25_topk"].fn(spark, sf).collect()
    assert rows, "BM25 returned no hits"
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_phrase_search_hits_are_real(spark):
    """Every reported doc actually contains the adjacent-word phrase,
    at exactly the reported count (checked in Python on raw text)."""
    import re

    from minimapreduce_spark.operators.text_analysis import (
        PHRASE,
        phrase_search_positional,
    )
    from tests.conftest import SF_DIR

    out = phrase_search_positional(spark, SF_DIR).toPandas()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert len(out) > 0
    for _, row in out.iterrows():
        words = [w for w in re.split(r"[^A-Za-z]+", texts[row["doc_id"]]) if w]
        n = sum(
            1
            for i in range(len(words) - 1)
            if words[i] == PHRASE[0] and words[i + 1] == PHRASE[1]
        )
        assert n == row["n_hits"] and n > 0


def test_corpus_profile_reconciles(spark):
    from minimapreduce_spark.operators.text_analysis import corpus_source_profile
    from tests.conftest import SF_DIR

    out = corpus_source_profile(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    assert out["n_docs"].sum() == len(docs)
    assert out["total_chars"].sum() == docs["n_chars"].sum()
    for _, row in out.iterrows():
        sub = docs[docs["source"] == row["source"]]
        counts = sub["lang"].value_counts()
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert row["top_lang"] == best
        assert row["n_langs"] == sub["lang"].nunique()

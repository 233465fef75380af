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


def test_unigram_char_conservation_and_vocab(spark):
    """Hard-EM invariants that hold on ANY corpus: every word's Viterbi
    segmentation covers each character exactly once, so
    Σ_p cnt_r(p)·len(p) == Σ_w freq(w)·len(w) for every EM round; the
    vocabulary contains every single character plus at most
    UNI_SEED_MULTI multi-char pieces."""
    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.text_analysis import UNI_SEED_MULTI
    from tests.conftest import SF_DIR

    out = q.REGISTRY["unigram_train_pieces"].fn(spark, SF_DIR).toPandas()
    singles = out[out.plen == 1]
    multis = out[out.plen > 1]
    assert len(multis) <= UNI_SEED_MULTI
    # chars of the corpus vocabulary == the single-char pieces
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    total_chars = wf.select(
        F.sum(F.length("word") * F.col("freq")).alias("t")
    ).head().t
    chars = {
        r.c
        for r in wf.select(
            F.explode(F.split("word", "")).alias("c")
        ).where(F.col("c") != "").distinct().collect()
    }
    assert set(singles.piece) == chars
    for col in ("cnt_r1", "cnt_r2"):
        got = int((out[col] * out.plen).sum())
        assert got == total_chars, (col, got, total_chars)


def test_unigram_planted_whole_word_piece(spark, tmp_path):
    """On a corpus dominated by one 4-char word, the trained tokenizer
    must tokenize that word as ONE piece: the whole-word candidate owns
    nearly the whole probability mass, so Viterbi prefers one lp hit
    over any multi-piece split (each extra piece costs another ≤-ln(2)
    factor). Hard counts must show it."""
    import os

    from minimapreduce_spark import queries as q

    docs = [(i, "abab " * 30 + "zq", "en", "src0", 152) for i in range(20)]
    d = str(tmp_path / "uni_planted")
    os.makedirs(d)
    spark.createDataFrame(
        docs, "doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    out = (
        q.REGISTRY["unigram_train_pieces"].fn(spark, d).toPandas().set_index("piece")
    )
    assert out.loc["abab"].cnt_r2 == 600  # 20 docs × 30 occurrences
    # the single chars a/b carry no hard count once the whole word wins
    assert out.loc["a"].cnt_r2 == 0 and out.loc["b"].cnt_r2 == 0
    assert out.loc["abab"].lp_final > out.loc["ab"].lp_final

"""Round-3 curation operators: algorithmic invariants beyond the
oracle hash (which tests/test_oracle_sweep.py covers automatically)."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR

from minimapreduce_spark import queries as q


def test_quota_sample_equals_naive_single_window(spark):
    """The salted two-phase grouped top-k must return EXACTLY what the
    textbook single window per source returns — same rows, same ranks —
    on the engine itself (not just vs DuckDB): the salting is a plan
    transformation, not a semantics change."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from minimapreduce_spark.operators.pipeline import QUOTA_K
    from minimapreduce_spark.operators.text_analysis import text_quality_score

    got = {
        (r.doc_id, r.source, r.rnk)
        for r in q.REGISTRY["per_source_quota_sample"].fn(spark, SF_DIR).collect()
    }
    scored = text_quality_score(spark, SF_DIR).select("doc_id", "source", "quality")
    w = W.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    naive = {
        (r.doc_id, r.source, r.rnk)
        for r in scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= QUOTA_K)
        .collect()
    }
    assert got == naive


def test_quota_sample_respects_quota(spark):
    from collections import Counter

    from minimapreduce_spark.operators.pipeline import QUOTA_K

    rows = q.REGISTRY["per_source_quota_sample"].fn(spark, SF_DIR).collect()
    per_source = Counter(r.source for r in rows)
    assert per_source and all(n <= QUOTA_K for n in per_source.values())


def test_pca_steps_match_independent_float_computation(spark):
    """The two exact integer power steps must compute the same vector
    an independent float64 path computes (G·(G·1), G = XᵀX over the
    quantized matrix) — direction agreement to float precision. (The
    fixture spectrum is near-flat, so this is deliberately NOT a
    comparison against the converged eigenvector — see the docstring.)"""
    rows = q.REGISTRY["embedding_pca_power_iteration"].fn(spark, SF_DIR).collect()
    v = np.array([r.dir_fp for r in sorted(rows, key=lambda r: r.dim)], dtype=float)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").toPandas()
    X = np.round(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 10000)
    G = X.T @ X
    ref = G @ (G @ np.ones(64))
    cos = abs(v @ ref) / (np.linalg.norm(v) * np.linalg.norm(ref))
    assert cos > 0.999999, cos


def test_pca_canonical_orientation(spark):
    """The dominant component must be reported non-negative (the
    sign-orientation rule) and scaled to exactly ±1e6 at its peak."""
    rows = q.REGISTRY["embedding_pca_power_iteration"].fn(spark, SF_DIR).collect()
    vals = [r.dir_fp for r in rows]
    assert max(abs(v) for v in vals) == 1_000_000
    dominant = max(vals, key=abs)
    assert dominant == 1_000_000  # sign-oriented positive


def test_psi_is_symmetric_and_small_on_halves(spark):
    """PSI terms are individually >= 0 (the (p-q)·ln(p/q) form), the
    bins are total (exactly PSI_BINS rows), and splitting one
    stationary stream in half must yield a small index (no real
    drift in the fixture)."""
    from minimapreduce_spark.operators.analytics import PSI_BINS

    rows = q.REGISTRY["psi_value_drift"].fn(spark, SF_DIR).collect()
    assert len(rows) == PSI_BINS
    assert sorted(r.bin for r in rows) == list(range(PSI_BINS))
    assert all(r.psi_term >= 0 for r in rows)
    assert sum(r.psi_term for r in rows) < 0.1


def test_bigram_model_penalizes_broken_word_order(spark):
    """The discriminative claim, on a corpus WITH bigram structure
    (the driver fixture is conditionally independent word soup —
    bigram ≈ unigram there, verified by the entropy check below):
    plant 100 docs of a stereotyped phrase chain plus a few
    word-shuffled twins; the shuffled docs must score clearly worse
    under the corpus-trained bigram model, while their unigram scores
    are identical by construction."""
    import os
    import random
    import tempfile

    phrase = "alpha beta gamma delta epsilon zeta "
    rng = random.Random(7)
    rows = []
    for i in range(100):
        rows.append((i, phrase * 20))
    for i in range(100, 110):
        words = (phrase * 20).split()
        rng.shuffle(words)
        rows.append((i, " ".join(words) + " "))
    docs = spark.createDataFrame(
        [(i, t.strip(), "en", "synth", len(t)) for i, t in rows],
        "doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = q.REGISTRY["text_bigram_logprob"].fn(spark, d).collect()
    natural = np.mean([r.avg_neg_logprob for r in out if r.doc_id < 100])
    shuffled = np.mean([r.avg_neg_logprob for r in out if r.doc_id >= 100])
    assert shuffled > natural + 0.5, (natural, shuffled)


def test_bigram_equals_unigram_on_structureless_corpus(spark):
    """On the driver's synthetic corpus words are conditionally
    independent, so the interpolated bigram score should sit close to
    the unigram score corpus-wide — the documented caveat that the
    fixture demonstrates the operator's shape, not corpus realism."""
    import pyspark.sql.functions as F

    bi = (
        q.REGISTRY["text_bigram_logprob"].fn(spark, SF_DIR)
        .agg(F.avg("avg_neg_logprob"))
        .collect()[0][0]
    )
    uni = (
        q.REGISTRY["text_unigram_logprob"].fn(spark, SF_DIR)
        .agg(F.avg("avg_neg_logprob"))
        .collect()[0][0]
    )
    assert abs(bi - uni) < 0.25, (bi, uni)


def test_boilerplate_detects_planted_recurring_ngrams(spark):
    """Plant one 8-gram in many docs of one source and the per-source
    report must count at least one boilerplate n-gram there."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from minimapreduce_spark.operators.text_analysis import BOILER_MIN_DOCS

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.select("source").first()["source"]
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("source") == target,
            F.concat(F.lit("subscribe to our mailing list for updates today now "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    with tempfile.TemporaryDirectory() as d:
        planted.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r.source: r for r in q.REGISTRY["boilerplate_ngram_sources"].fn(spark, d).collect()
        }
    assert target in rows
    assert rows[target].n_boilerplate_ngrams >= 1
    assert rows[target].max_doc_count >= BOILER_MIN_DOCS

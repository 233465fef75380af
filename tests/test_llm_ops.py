"""LLM-pipeline operators: oracle matches + algorithmic invariants."""

import pytest

from tests.conftest import SF_DIR, run_and_compare

ORACLED = [
    "text_quality_score",
    "text_langid",
    "token_count_stats",
    "doc_fingerprint",
    "text_tfidf_top_terms",
    "text_top_bigrams",
    "ann_cosine_topk_numpy",
    "dedup_simhash",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_minhash_incremental",
    "minhash_index_append_probe",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_windows",
    "multimodal_wav_decode",
    "multimodal_ppm_decode",
    "multimodal_png_decode",
    "multimodal_jpeg_decode",
    "ann_graph_greedy_search",
    "ann_graph_hierarchical_search",
]


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_ngram_finds_planted_near_dups(spark):
    """The fixture corpus plants near-duplicate docs (jaccard ≈ 0.99);
    the exact-jaccard pass must surface them."""
    from minimapreduce_spark import queries as q

    rows = q.queries()["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.jaccard >= 0.8 for r in rows)


def test_minhash_candidates_superset_of_high_jaccard(spark):
    """LSH banding must recover every planted pair at j≥0.9 (miss
    probability ~8e-4 per pair; deterministic hashes → stable here)."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import jaccard_pairs

    got = {(r.doc_a, r.doc_b) for r in q.queries()["dedup_minhash"](spark, SF_DIR).collect()}
    want = {(r.doc_a, r.doc_b) for r in jaccard_pairs(spark, SF_DIR, 0.9).collect()}
    assert got == want


def test_incremental_minhash_equals_full_restricted(spark):
    """The incremental probe must return EXACTLY the full dedup_minhash
    output restricted to batch-touching pairs — same signatures, same
    banding, same verification, only the candidate join is batch-driven."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import INCR_BATCH_MOD

    full = q.queries()["dedup_minhash"](spark, SF_DIR).collect()
    want = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in full
        if r.doc_a % INCR_BATCH_MOD == 0 or r.doc_b % INCR_BATCH_MOD == 0
    }
    got = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in q.queries()["dedup_minhash_incremental"](spark, SF_DIR).collect()
    }
    assert got == want


def test_minhash_index_probe_artifact_equals_recompute_and_plan_has_no_build(
    spark, tmp_path
):
    """The build-once/probe-many contract of `dedup_minhash_index_probe`
    (the `ivfpq_index_build` discipline applied to dedup):

      - the persisted artifact's two tables are ROW-IDENTICAL to a
        fresh corpus-side recompute (the artifact is a pure function of
        the fixture), cross-checked through DuckDB reading the artifact
        parquet directly;
      - the probe output equals `dedup_minhash_incremental` EXACTLY
        (same shingles, signatures, banding, verification — only the
        corpus side's source differs);
      - the PROBE plan contains zero corpus-side index-build jobs: every
        documents scan is behind the checkpointed BATCH pipeline (Scan
        ExistingRDD), and the corpus side appears only as artifact
        parquet scans (buckets + shingles);
      - a rebuild call with the artifact present is a no-op."""
    import os as _os

    import duckdb
    from pyspark.sql import functions as F

    from minimapreduce_spark import plans
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import fan_out, load_table
    from minimapreduce_spark.operators.dedup import (
        INCR_BATCH_MOD,
        minhash_band_buckets,
        minhash_index_build,
        minhash_signatures,
        shingle_hashes,
    )

    root = minhash_index_build(spark, SF_DIR, root=str(tmp_path / "mh_idx"))

    # artifact ≡ recompute, frame by frame, via DuckDB on the parquet
    corpus = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % INCR_BATCH_MOD != 0)
    )
    base = shingle_hashes(spark, SF_DIR, distinct=False, docs=fan_out(spark, corpus))
    fresh_buckets = minhash_band_buckets(
        minhash_signatures(spark, SF_DIR, shingles=base)
    )
    con = duckdb.connect()
    art_b = con.execute(
        f"SELECT doc_id, CAST(band AS INT) AS band, bh"
        f" FROM '{root}/buckets/**/*.parquet' ORDER BY doc_id, band"
    ).fetchall()
    want_b = sorted(
        (r.doc_id, r.band, r.bh) for r in fresh_buckets.collect()
    )
    assert art_b == want_b, "artifact buckets diverge from recompute"
    art_s = con.execute(
        f"SELECT doc_id, h FROM '{root}/shingles/*.parquet' ORDER BY doc_id, h"
    ).fetchall()
    want_s = sorted((r.doc_id, r.h) for r in base.distinct().collect())
    assert art_s == want_s, "artifact shingles diverge from recompute"
    con.close()

    # probe ≡ inline incremental, end to end
    probe = {
        tuple(r)
        for r in q.queries()["dedup_minhash_index_probe"](spark, SF_DIR).collect()
    }
    inline = {
        tuple(r)
        for r in q.queries()["dedup_minhash_incremental"](spark, SF_DIR).collect()
    }
    assert probe == inline

    # zero corpus-side build jobs in the probe plan: the batch pipeline
    # is checkpointed (Scan ExistingRDD), so NO documents.parquet scan
    # remains; the corpus side is artifact parquet scans only
    plan = plans.physical_plan(
        q.queries()["dedup_minhash_index_probe"](spark, SF_DIR)
    )
    assert plan.count("documents.parquet") == 0
    assert plan.count("minimapreduce_minhash_") + plan.count("mh_idx") >= 2

    # rebuild is a no-op when present
    before = _os.stat(root).st_mtime_ns
    assert minhash_index_build(spark, SF_DIR, root=root) == root
    assert _os.stat(root).st_mtime_ns == before


def test_minhash_index_append_equals_rebuild_and_links_not_copies(spark, tmp_path):
    """The APPEND rung (`minhash_index_append` — round-9 verdict item
    3): day-1 arrivals merge INTO the persisted band index so day 2
    probes corpus ∪ day 1. Pins:

      - the appended artifact's tables are ROW-IDENTICAL to a from-
        scratch build over corpus ∪ day-1 (append ≡ rebuild);
      - the base artifact's data files enter the appended artifact as
        HARDLINKS (same inode) — the append never rewrites corpus
        bytes, realizing the cost-∝-batch claim physically;
      - the registered probe output equals the full `dedup_minhash`
        restricted to day-2-touching pairs (every day-2 × day-1 match
        is visible ONLY through the appended artifact);
      - re-append with the artifact present is a no-op."""
    import os as _os

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import fan_out, load_table
    from minimapreduce_spark.operators.dedup import (
        APPEND_DAY_MOD,
        INCR_BATCH_MOD,
        minhash_band_buckets,
        minhash_index_append,
        minhash_index_build,
        minhash_signatures,
        shingle_hashes,
    )

    base_root = minhash_index_build(spark, SF_DIR, root=str(tmp_path / "base"))
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    day1 = docs.where(F.col("doc_id") % APPEND_DAY_MOD == 0)
    root = minhash_index_append(
        spark, SF_DIR, day1, base_root, root=str(tmp_path / "appended")
    )

    # append ≡ rebuild, frame by frame, over corpus ∪ day-1
    union_docs = docs.where(
        (F.col("doc_id") % INCR_BATCH_MOD != 0)
        | (F.col("doc_id") % APPEND_DAY_MOD == 0)
    )
    base = shingle_hashes(spark, SF_DIR, distinct=False, docs=fan_out(spark, union_docs))
    want_buckets = sorted(
        (r.doc_id, r.band, r.bh)
        for r in minhash_band_buckets(
            minhash_signatures(spark, SF_DIR, shingles=base)
        ).collect()
    )
    got_buckets = sorted(
        (r.doc_id, r.band, r.bh)
        for r in spark.read.parquet(f"{root}/buckets")
        .select("doc_id", F.col("band").cast("int").alias("band"), "bh")
        .collect()
    )
    assert got_buckets == want_buckets, "appended buckets diverge from rebuild"
    want_sh = sorted((r.doc_id, r.h) for r in base.distinct().collect())
    got_sh = sorted(
        (r.doc_id, r.h) for r in spark.read.parquet(f"{root}/shingles").collect()
    )
    assert got_sh == want_sh, "appended shingles diverge from rebuild"

    # base files fold in as hardlinks, not copies
    linked = 0
    for sub in ("buckets", "shingles"):
        for dirpath, _dirs, files in _os.walk(_os.path.join(root, sub)):
            for f in files:
                if f.startswith("base-") and f.endswith(".parquet"):
                    rel = _os.path.relpath(dirpath, _os.path.join(root, sub))
                    src = _os.path.join(base_root, sub, rel, f[len("base-"):])
                    assert _os.path.samefile(_os.path.join(dirpath, f), src)
                    linked += 1
    n_base_files = sum(
        1
        for sub in ("buckets", "shingles")
        for _, _, files in _os.walk(_os.path.join(base_root, sub))
        for f in files
        if f.endswith(".parquet")
    )
    assert linked == n_base_files > 0

    # registered probe ≡ full dedup restricted to day-2-touching pairs
    full = q.queries()["dedup_minhash"](spark, SF_DIR).collect()
    want = {
        tuple(r)
        for r in full
        if r.doc_a % APPEND_DAY_MOD == INCR_BATCH_MOD
        or r.doc_b % APPEND_DAY_MOD == INCR_BATCH_MOD
    }
    got = {
        tuple(r)
        for r in q.queries()["minhash_index_append_probe"](spark, SF_DIR).collect()
    }
    assert got == want

    # re-append is a no-op when present
    before = _os.stat(root).st_mtime_ns
    assert minhash_index_append(spark, SF_DIR, day1, base_root, root=root) == root
    assert _os.stat(root).st_mtime_ns == before


def test_minhash_index_compact_content_identical_one_file_per_band(spark, tmp_path):
    """The COMPACTION rung: after TWO successive appends (day 1, then
    day 2 — the fragmentation case compaction exists for), the
    compacted artifact is ROW-IDENTICAL to the fragmented one (and
    therefore to a full rebuild — append ≡ rebuild is already pinned),
    every band partition holds exactly ONE data file (vs one set per
    append in the fragmented artifact), the compaction plan never
    scans the documents table, the registered compact probe equals
    the append probe frame-for-frame, and re-compaction is a no-op."""
    import os as _os

    from pyspark.sql import functions as F

    from minimapreduce_spark import plans
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.dedup import (
        APPEND_DAY_MOD,
        INCR_BATCH_MOD,
        MINHASH_BUCKET_SCHEMA,
        MINHASH_SHINGLE_SCHEMA,
        minhash_index_append,
        minhash_index_build,
        minhash_index_compact,
    )

    base_root = minhash_index_build(spark, SF_DIR, root=str(tmp_path / "base"))
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    day1 = docs.where(F.col("doc_id") % APPEND_DAY_MOD == 0)
    day2 = docs.where(F.col("doc_id") % APPEND_DAY_MOD == INCR_BATCH_MOD)
    a1 = minhash_index_append(spark, SF_DIR, day1, base_root, root=str(tmp_path / "a1"))
    a2 = minhash_index_append(spark, SF_DIR, day2, a1, root=str(tmp_path / "a2"))
    c = minhash_index_compact(spark, a2, out_root=str(tmp_path / "compacted"))

    # content-identical, both tables
    for sub, schema in (
        ("buckets", MINHASH_BUCKET_SCHEMA),
        ("shingles", MINHASH_SHINGLE_SCHEMA),
    ):
        frag = sorted(
            map(tuple, spark.read.schema(schema).parquet(f"{a2}/{sub}").collect())
        )
        comp = sorted(
            map(tuple, spark.read.schema(schema).parquet(f"{c}/{sub}").collect())
        )
        assert frag == comp, f"compaction changed {sub} content"

    # exactly one data file per band partition (fragmented has >1)
    def files_per_band(root):
        out = {}
        bdir = _os.path.join(root, "buckets")
        for d in _os.listdir(bdir):
            if d.startswith("band="):
                out[d] = sum(
                    1
                    for f in _os.listdir(_os.path.join(bdir, d))
                    if f.endswith(".parquet")
                )
        return out

    frag_counts = files_per_band(a2)
    comp_counts = files_per_band(c)
    assert set(frag_counts) == set(comp_counts)
    assert all(n == 1 for n in comp_counts.values()), comp_counts
    assert any(n > 1 for n in frag_counts.values()), (
        "two appends should fragment at least one band"
    )

    # probe-from-compacted ≡ probe-from-fragmented (registered twins)
    got = {
        tuple(r)
        for r in q.queries()["minhash_index_compact_probe"](spark, SF_DIR).collect()
    }
    want = {
        tuple(r)
        for r in q.queries()["minhash_index_append_probe"](spark, SF_DIR).collect()
    }
    assert got == want

    # the registered probe's plan: no documents scans outside the
    # checkpointed batch pipeline; compacted artifact scanned
    plan = plans.physical_plan(
        q.queries()["minhash_index_compact_probe"](spark, SF_DIR)
    )
    assert plan.count("documents.parquet") == 0
    assert "_compact" in plan

    # re-compaction no-op
    before = _os.stat(c).st_mtime_ns
    assert minhash_index_compact(spark, a2, out_root=c) == c
    assert _os.stat(c).st_mtime_ns == before


def _soup_docs(rows_spec):
    """(doc_id, text) rows with per-doc-unique purely-alphabetic vocab
    (the shingler splits on [^A-Za-z]+), so two soup docs share zero
    shingles unless one is an exact copy of the other."""
    import string

    def b26(n):
        s = ""
        n += 1
        while n:
            n, r = divmod(n - 1, 26)
            s = string.ascii_lowercase[r] + s
        return s

    rows = []
    for doc_id, copy_of in rows_spec:
        src = copy_of if copy_of is not None else doc_id
        text = " ".join(f"w{b26(src)}x{b26(i)}" for i in range(12))
        rows.append((doc_id, text))
    return rows


def test_incremental_candidates_independent_of_corpus_size(spark):
    """THE incremental scale claim: candidate volume is driven by the
    batch, never the corpus. A fixed 20-doc batch (one doc a copy of
    corpus doc 7) probes a 200-doc and an 800-doc corpus of mutually
    shingle-disjoint docs; the 4x corpus must not change the candidate
    set, the planted batch-vs-corpus pair must verify at jaccard 1.0,
    and a corpus-internal duplicate pair (docs 5 and 6, neither in the
    batch) must never be emitted — the corpus side never self-joins."""
    from pyspark.sql import functions as F

    from minimapreduce_spark.operators.dedup import (
        minhash_incremental_candidates,
        minhash_incremental_pairs,
    )

    batch = [(1_000_000 + i, None) for i in range(19)] + [(1_000_019, 7)]
    results = {}
    for n_corpus in (200, 800):
        spec = [(i, 6 if i == 5 else None) for i in range(n_corpus)] + batch
        docs = spark.createDataFrame(_soup_docs(spec), "doc_id: bigint, text: string")
        is_batch = F.col("doc_id") >= 1_000_000
        cands, _sh = minhash_incremental_candidates(spark, SF_DIR, docs, is_batch)
        results[n_corpus] = {(r.doc_a, r.doc_b) for r in cands.collect()}
        pairs = minhash_incremental_pairs(spark, SF_DIR, docs, is_batch).collect()
        found = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
        assert found.get((7, 1_000_019)) == 1.0, found
        assert (5, 6) not in found, "corpus-internal pair leaked from the batch probe"
    assert results[200] == results[800] == {(7, 1_000_019)}, results


def test_incremental_batch_gate_paths_bit_identical(spark):
    """The batch-side content-group gate (dup-heavy arrival batches —
    the recrawl shape) must be a pure optimization: a 50%-duplicated
    batch probed through the grouped path returns EXACTLY what the
    ungrouped machinery (candidates + verify, no collapse) returns,
    including within-batch copy pairs and batch-copy-vs-corpus pairs."""
    from pyspark.sql import functions as F

    from minimapreduce_spark.operators.dedup import (
        MINHASH_THRESHOLD,
        jaccard_pairs,
        minhash_incremental_candidates,
        minhash_incremental_pairs,
    )

    spec = [(i, None) for i in range(60)]
    # batch: 10 fresh docs + 10 copies of batch doc 0 + 2 copies of
    # corpus doc 7 → 55% duplicated, gate engages
    batch = (
        [(1_000_000 + i, None) for i in range(10)]
        + [(1_000_100 + i, 1_000_000) for i in range(10)]
        + [(1_000_200, 7), (1_000_201, 7)]
    )
    docs = spark.createDataFrame(
        _soup_docs(spec + batch), "doc_id: bigint, text: string"
    )
    is_batch = F.col("doc_id") >= 1_000_000
    gated = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in minhash_incremental_pairs(spark, SF_DIR, docs, is_batch).collect()
    }
    cands, sh = minhash_incremental_candidates(spark, SF_DIR, docs, is_batch)
    plain = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in jaccard_pairs(
            spark, SF_DIR, MINHASH_THRESHOLD, candidates=cands, shingles=sh
        ).collect()
    }
    assert gated == plain
    # the copy structure is actually found: corpus doc 7 pairs with
    # both its batch copies, and the 11-member batch copy group yields
    # all C(11,2) within-batch pairs
    assert {(7, 1_000_200), (7, 1_000_201)} <= {(a, b) for a, b, *_ in gated}
    within = [p for p in gated if p[0] >= 1_000_000 and p[1] >= 1_000_000]
    assert len(within) == 55 + 1, len(within)  # C(11,2) + the 200/201 copy pair


def test_simhash_near_dups_overlap_jaccard_pairs(spark):
    """SimHash (hamming ≤ 3) should rediscover the planted near-dups
    and assign identical fingerprints only to near-identical docs."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import jaccard_pairs

    sim = {(r.doc_a, r.doc_b) for r in q.queries()["dedup_simhash"](spark, SF_DIR).collect()}
    jac = {(r.doc_a, r.doc_b) for r in jaccard_pairs(spark, SF_DIR, 0.9).collect()}
    assert jac & sim, "simhash found none of the planted near-dup pairs"


def test_ivf_recall_vs_brute_force(spark):
    """IVF top-5 must overlap the brute-force top-10 meaningfully
    (partition pruning trades recall for a 1/n_partitions scan)."""
    from minimapreduce_spark import queries as q

    brute = q.queries()["ann_cosine_topk"](spark, SF_DIR)
    ivf = q.queries()["ann_ivf_topk"](spark, SF_DIR)
    b = {(r.q_vec_id, r.neighbor_id) for r in brute.collect()}
    i = {(r.q_vec_id, r.neighbor_id) for r in ivf.collect()}
    assert len(i & b) / len(i) > 0.2, "IVF recall collapsed — routing is broken"


def test_embedding_lsh_recall_on_planted_near_dups(spark):
    """Random-hyperplane LSH candidates must recover planted high-cosine
    pairs: 40 base vectors, each with a near-copy (cosine ≳ 0.995 after
    a tiny deterministic perturbation). All 40 true pairs must appear in
    the candidate set, and the filter must prune most of the 80×80
    pairwise space."""
    import random

    from minimapreduce_spark.operators.dedup import embedding_lsh_candidates

    rng = random.Random(0)
    dim, n = 16, 40
    rows = []
    for i in range(n):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        near = [v + 0.01 * rng.gauss(0, 1) for v in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, near))
    emb = spark.createDataFrame(rows, "vec_id: bigint, emb: array<double>")
    cand = {
        (r.vec_a, r.vec_b)
        for r in embedding_lsh_candidates(emb, n_planes=64, bands=8).collect()
    }
    true_pairs = {(2 * i, 2 * i + 1) for i in range(n)}
    assert true_pairs <= cand, f"missed planted pairs: {sorted(true_pairs - cand)[:5]}"
    # random Gaussian pairs are near-orthogonal: an 8-bit band matches
    # with p = 2^-8, so the candidate set should stay far below all-pairs
    assert len(cand) < (2 * n) * (2 * n - 1) / 2 * 0.5, "LSH pruned almost nothing"


def test_embedding_lsh_query_consistent_with_exact_baseline(spark):
    """The registered LSH query must be sound vs the exact all-pairs
    baseline: every verified pair's cosine is ≥ its own 0.30 threshold,
    and every LSH pair that clears the exact query's 0.45 threshold
    appears in the exact result (LSH verification can't invent pairs)."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import EMB_DUP_THRESHOLD

    lsh = q.queries()["dedup_embedding_lsh"](spark, SF_DIR).collect()
    assert len(lsh) > 0
    assert all(r.cosine_sim >= 0.30 for r in lsh)
    exact = {
        (r.vec_a, r.vec_b)
        for r in q.queries()["dedup_embedding_cosine"](spark, SF_DIR).collect()
    }
    high = {(r.vec_a, r.vec_b) for r in lsh if r.cosine_sim >= EMB_DUP_THRESHOLD}
    assert high <= exact


def test_embedding_lsh_scores_clear_rounding_boundaries():
    """Pin the residual float risk dedup_embedding_lsh's docstring
    documents: the verify cosine is engine-float (numpy einsum vs
    DuckDB list_cosine_similarity), so a pair sitting exactly on a
    6-dp rounding midpoint — or on the midpoint that decides the 0.30
    threshold — could round differently across engines and flip an
    output value or membership. A cross-engine flip needs the raw
    score within a few double ulps (~1e-16 at these magnitudes) of a
    midpoint; assert every fixture pair at or near the threshold
    clears the nearest midpoint by >= 1e-13, three orders of magnitude
    of headroom."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    # float64, mirroring the engine's cast("array<double>") before scoring
    E = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ En.T
    iu = np.triu_indices(len(E), k=1)
    raw = cos[iu]
    # pairs at/near the 0.30 threshold (superset of every verified
    # output pair and of the membership-deciding boundary band)
    near = raw[raw >= 0.2999]
    assert len(near) > 0
    # distance to the nearest 6-dp rounding midpoint, in raw units
    margin = np.abs((near * 1e6) % 1.0 - 0.5) * 1e-6
    assert margin.min() > 1e-13, f"pair within {margin.min():.2e} of a rounding midpoint"


def test_zero_vector_copy_group_drops(spark):
    """Pin the degenerate-zero-vector semantics the iso-component
    comment in dedup_embedding_clusters documents (round-4 ADVICE
    follow-up). Both engines drop a zero-vector copy group, but by
    DIFFERENT mechanisms, neither of them "NaN fails the >=" (both
    engines order NaN above every number, so a surviving NaN would be
    KEPT): Spark's numpy 0/0 NaN becomes NULL across the pandas→Arrow
    boundary in mapInPandas and NULL >= t filters out; DuckDB's
    list_cosine_similarity(zero, zero) returns -1.0, which fails the
    threshold numerically. This test pins all three facts so a change
    in any engine's behavior (or a refactor away from mapInPandas)
    resurfaces the question loudly."""
    import duckdb

    from minimapreduce_spark.operators.dedup import embedding_lsh_verified_pairs

    dim = 64  # the band builder's plane weights are derived per fixture dim
    e0, e1 = [0.0] * dim, [0.0] * dim
    e0[0], e1[1] = 1.0, 1.0
    rows = [
        (10, [0.0] * dim),
        (11, [0.0] * dim),  # byte-identical zero copy → one content group
        (20, e0),
        (21, e1),
    ]
    emb = spark.createDataFrame(rows, "vec_id: bigint, emb: array<double>")
    groups, hits = embedding_lsh_verified_pairs(
        spark, emb, return_content_level=True
    )
    # the zero pair collapsed into one content group with rep 10 ...
    assert {(r.rep, tuple(r.members)) for r in groups.select("rep", "members").collect()} >= {
        (10, (10, 11))
    }
    # ... but its NaN-scored self-pair did NOT survive the verify filter
    assert hits.where("rep_a = rep_b").count() == 0
    # mechanism, DuckDB side: zero-vector cosine is -1.0, not NaN
    assert duckdb.sql(
        "SELECT list_cosine_similarity([0.0,0.0], [0.0,0.0])"
    ).fetchone()[0] == -1.0
    # and the counterfactual both comments hinge on: a literal NaN WOULD
    # be kept by >= on both engines (NaN orders above every number)
    assert spark.sql("SELECT double('nan') >= 0.30 AS kept").first().kept is True
    assert duckdb.sql("SELECT CAST('nan' AS DOUBLE) >= 0.30").fetchone()[0] is True


def test_decode_image_dispatches_by_magic_bytes():
    """decode_image (the former JPEG stub) now dispatches every
    container to a real decoder; junk still fails loudly."""
    from minimapreduce_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_payload,
    )

    out = decode_image(encode_jpeg_payload("dispatch me"))
    assert out["n_components"] == 1 and out["pixel_checksum"] > 0
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"JUNKJUNKJUNK")


def test_jpeg_roundtrip_is_exact():
    """The baseline JFIF codec round-trips exactly: solid 8x8 blocks +
    a flat quant table make the lossy pipeline lossless, so the decoded
    checksum must equal the closed-form sum over the block grid — any
    bug in Huffman category extension (negative DC diffs!), byte
    stuffing, zigzag, or IDCT normalization breaks this."""
    from minimapreduce_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_payload,
    )

    for text in ["a", "Hello world, this is a test document!", "x" * 97]:
        n, fill = len(text), ord(text[0])
        wb, hb = 1 + n % 6, 1 + n % 4
        got = decode_jpeg(encode_jpeg_payload(text))
        assert got["width"] == 8 * wb and got["height"] == 8 * hb
        assert got["n_blocks"] == wb * hb
        want = sum(
            64 * ((fill + 7 * y + 3 * x) % 256)
            for y in range(hb)
            for x in range(wb)
        ) % 1000000007
        assert got["pixel_checksum"] == want, text


def test_jpeg_decoder_rejects_corruption():
    from minimapreduce_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_payload,
    )

    good = encode_jpeg_payload("corruption probe text")
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"XX" + good)
    # flip the SOF0 marker to SOF2: progressive must be refused, not
    # silently mis-decoded
    import struct

    bad = bytearray(good)
    sof_at = bytes(bad).index(b"\xff\xc0")
    bad[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(bad))


def test_multimodal_binary_schema(spark):
    from minimapreduce_spark.operators.multimodal import binary_table

    bt = binary_table(spark, SF_DIR)
    assert dict((f.name, f.dataType.simpleString()) for f in bt.schema.fields) == {
        "doc_id": "bigint",
        "payload": "binary",
        "meta": "struct<mime:string,n_chars:bigint,origin:string>",
    }


def test_cluster_assignment_consistent_with_pairs(spark):
    """Every near-dup pair's endpoints must land in the same cluster,
    and each cluster's id must be its minimum member (the canonical)."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import NGRAM_THRESHOLD, jaccard_pairs

    labels = {r.doc_id: r.cluster_id for r in q.queries()["dedup_clusters"](spark, SF_DIR).collect()}
    for r in jaccard_pairs(spark, SF_DIR, NGRAM_THRESHOLD).collect():
        assert labels[r.doc_a] == labels[r.doc_b], (r.doc_a, r.doc_b)
    import collections

    members = collections.defaultdict(list)
    for doc, c in labels.items():
        members[c].append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_contamination_consistent_with_split(spark):
    """Every audited doc is a test-split doc with shingles; ratios lie
    in [0, 1]; and a doc whose text is copied verbatim from a train doc
    would score 1.0 — checked by construction: shingles shared with
    train are a subset of the doc's own shingles."""
    from minimapreduce_spark.operators.dedup import contamination_test_train
    from minimapreduce_spark.operators.pipeline import split_train_test

    out = contamination_test_train(spark, SF_DIR).toPandas()
    splits = split_train_test(spark, SF_DIR).toPandas().set_index("doc_id")["split"]
    assert (splits.loc[out["doc_id"]] == "test").all()
    assert (out["n_contaminated"] <= out["n_shingles"]).all()
    assert out["contamination_ratio"].between(0, 1).all()


def test_int8_ivf_recall_vs_float_ivf(spark):
    """Quantized scoring must largely agree with the float IVF path:
    same routing, so recall@5 of int8 vs float top-5 within the routed
    partition should be high (codes only coarsen the ranking)."""
    from minimapreduce_spark.operators.similarity import (
        ann_ivf_int8_topk,
        ann_ivf_topk,
    )

    i8 = ann_ivf_int8_topk(spark, SF_DIR).toPandas()
    fl = ann_ivf_topk(spark, SF_DIR).toPandas()
    recall_num = recall_den = 0
    for qid, grp in fl.groupby("q_vec_id"):
        truth = set(grp["neighbor_id"])
        got = set(i8[i8["q_vec_id"] == qid]["neighbor_id"])
        recall_num += len(truth & got)
        recall_den += len(truth)
    assert recall_den > 0
    recall = recall_num / recall_den
    assert recall >= 0.7, f"int8 recall@5 too low: {recall:.2f}"


def test_lloyd_local_and_distributed_kernels_agree(spark, monkeypatch):
    """The round-11 adaptive Lloyd dispatch (driver-local rounds under
    KM_LOCAL_POINTS_MAX) must be bit-identical to the distributed
    loops — the bpe_train_merges twin-equality discipline applied to
    k-means (full output frame) and the PQ codebook (every (m, cid)
    entry)."""
    import minimapreduce_spark.operators.similarity as sim

    km_local = sorted(
        map(tuple, sim.embedding_kmeans_lloyd(spark, SF_DIR).collect())
    )
    sub = sim._pq_subvectors(spark, SF_DIR)
    cb_local = sorted(
        (int(r["m"]), int(r["cid"]), tuple(r["ce"]))
        for r in sim._pq_train(spark, SF_DIR, sub).collect()
    )
    monkeypatch.setattr(sim, "KM_LOCAL_POINTS_MAX", -1)  # force distributed
    km_dist = sorted(
        map(tuple, sim.embedding_kmeans_lloyd(spark, SF_DIR).collect())
    )
    cb_dist = sorted(
        (int(r["m"]), int(r["cid"]), tuple(r["ce"]))
        for r in sim._pq_train(spark, SF_DIR, sub).collect()
    )
    assert km_local == km_dist
    assert cb_local == cb_dist and len(cb_local) > 0


def test_pq_adc_recall_and_codebook_health(spark):
    """PQ-ADC semantics beyond the hash match (a degenerate quantizer
    could still hash-match a faithfully degenerate oracle):
      - recall@5 vs the exact cosine top-5 clears a floor well above
        chance (5/corpus ≈ 0.01). This fixture's near-isotropic
        synthetic vectors are PQ's worst case — measured 0.36 with
        M=8/K=32/2 Lloyd iters — so the floor is 0.15, not the ≥0.7 a
        clustered corpus would support;
      - no query finds itself;
      - every vector gets exactly PQ_M codes and each subspace's codes
        span >1 codebook entry (the quantizer actually distinguishes)."""
    from minimapreduce_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        _pq_assign,
        _pq_subvectors,
        _pq_train,
        ann_cosine_topk,
        ann_pq_adc_topk,
    )

    pq = ann_pq_adc_topk(spark, SF_DIR).toPandas()
    assert (pq["q_vec_id"] != pq["neighbor_id"]).all(), "self-find"
    bf = ann_cosine_topk(spark, SF_DIR).toPandas()
    bf5 = bf[bf["rn"] <= 5]
    recall_num = recall_den = 0
    for qid, grp in bf5.groupby("q_vec_id"):
        truth = set(grp["neighbor_id"])
        got = set(pq[pq["q_vec_id"] == qid]["neighbor_id"])
        recall_num += len(truth & got)
        recall_den += len(truth)
    recall = recall_num / recall_den
    assert recall >= 0.15, f"PQ recall@5 below worst-case floor: {recall:.2f}"

    # codebook health: re-run train+encode (the operator's OWN training
    # helper, so this can never validate a stale recipe) and inspect
    sub = _pq_subvectors(spark, SF_DIR)
    cb = _pq_train(spark, SF_DIR, sub)
    codes = _pq_assign(sub, cb, keep_sq=False).toPandas()
    per_vec = codes.groupby("vec_id").size()
    assert (per_vec == PQ_M).all(), "a vector lost a subspace code"
    spans = codes.groupby("m")["cid"].nunique()
    assert len(spans) == PQ_M
    assert (spans > 1).all(), "a subspace's codes collapsed to one entry"
    assert codes["cid"].between(1, PQ_K).all()


def test_pq_adc_finds_the_right_neighborhood_on_clustered_corpus(spark, tmp_path):
    """Evidence for the 'fixture is PQ's worst case' claim, not just
    assertion — tested at the granularity PQ actually promises. On a
    PLANTED clustered corpus (500 vectors in 10 well-separated
    ±1-pattern clusters with small jitter), exact-rank recall@5 is the
    WRONG metric: quantization collapses same-cluster jitter onto
    shared codes by design, so PQ cannot (and need not) resolve WHICH
    five of a query's ~50 cosine≈0.997 cluster-mates rank first — that
    is the float-refine stage's job. What PQ promises is the
    NEIGHBORHOOD: essentially every retrieved neighbor must come from
    the query's own cluster (cross-cluster cosine ≈ 0), where the
    isotropic driver fixture gives codebooks no structure at all."""
    import numpy as np
    import pandas as pd

    from minimapreduce_spark.operators.similarity import ann_pq_adc_topk

    rng = np.random.RandomState(7)
    centers = rng.choice([-1.0, 1.0], size=(10, 64))
    vecs = []
    for i in range(500):
        c = centers[i % 10]
        vecs.append(c + 0.05 * rng.randn(64))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(500, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.arange(500, dtype=np.int32) % 10,
        }
    )
    d = tmp_path / "clustered"
    d.mkdir()
    pdf.to_parquet(str(d / "embeddings.parquet"), index=False)

    pq = ann_pq_adc_topk(spark, str(d)).toPandas()
    # query i belongs to cluster i % 10; so does neighbor n iff n ≡ i
    same = (pq["q_vec_id"] % 10 == pq["neighbor_id"] % 10).mean()
    assert same >= 0.95, f"cross-cluster retrievals: precision {same:.2f}"
    # and the retrieved same-cluster mates are genuinely near: their
    # pq_sim must sit in the intra-cluster band, far above cross-cluster
    assert (pq["pq_sim"] > 0.5).all(), pq["pq_sim"].min()


def test_canonical_by_quality_picks_best_member(spark):
    """The survivor of each cluster is a member with maximal quality
    among that cluster's members (doc_id breaks ties)."""
    from minimapreduce_spark.operators.dedup import (
        dedup_canonical_by_quality,
        dedup_clusters,
    )
    from minimapreduce_spark.operators.text_analysis import text_quality_score

    kept = dedup_canonical_by_quality(spark, SF_DIR).toPandas()
    members = dedup_clusters(spark, SF_DIR).toPandas()
    quality = text_quality_score(spark, SF_DIR).toPandas().set_index("doc_id")["quality"]
    for _, row in kept.iterrows():
        club = members[members["cluster_id"] == row["cluster_id"]]["doc_id"]
        assert row["n_members"] == len(club)
        best = quality.loc[club].max()
        assert quality.loc[row["kept_doc_id"]] == best == row["kept_quality"]


def test_wav_decoder_roundtrips_real_container():
    """decode_wav must parse an actual RIFF/WAVE file (built with the
    stdlib writer) — not pattern-match our own synthesis."""
    import io
    import wave

    from minimapreduce_spark.operators.multimodal import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(44100)
        w.writeframes(bytes([0, 255, 10, 20]))
    got = decode_wav(buf.getvalue())
    assert got == {
        "n_channels": 2,
        "sample_width": 1,
        "frame_rate": 44100,
        "n_frames": 2,  # 4 bytes / (2 ch × 1 byte)
        "energy": 0 + 255 * 255 + 100 + 400,
    }


def test_ppm_decoder_handles_comments_and_truncation():
    import pytest

    from minimapreduce_spark.operators.multimodal import decode_ppm

    good = b"P6\n# a comment\n2 3\n# another\n255\n" + bytes(range(18))
    got = decode_ppm(good)
    assert (got["width"], got["height"], got["maxval"]) == (2, 3, 255)
    assert got["n_pixel_bytes"] == 18 and got["pixel_checksum"] == sum(range(18))

    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")


def _png(width, height, rows_with_filters, bit_depth=8, color_type=2):
    """Hand-build a PNG from (filter_type, filtered_bytes) scanlines —
    independent of the package's encoder, so the decoder is tested
    against the spec, not against our own synthesis."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_with_filters)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_reverses_all_filters():
    """One 2-pixel-wide RGB image per filter type, with hand-computed
    expected reconstructions — including Average (3) and Paeth (4),
    which the synthesis lane never emits."""
    from minimapreduce_spark.operators.multimodal import decode_png

    # row0 None: raw = 10 20 30 | 40 50 60
    # row1 Sub:  filt = 1 2 3 | 5 5 5  -> raw = 1 2 3 | 6 7 8
    # row2 Up:   filt = 1 1 1 | 1 1 1  -> raw = 2 3 4 | 7 8 9
    # row3 Average: filt = 10 10 10 | 4 4 4, prev = 2 3 4 7 8 9
    #   i<3 (left=0): 10+(0+2)//2 10+(0+3)//2 10+(0+4)//2 = 11 11 12
    #   i>=3: 4+(11+7)//2 4+(11+8)//2 4+(12+9)//2 = 13 13 14
    # row4 Paeth: filt = 1 1 1 | 1 1 1, prev = 11 11 12 13 13 14
    #   i<3: a=0,c=0 -> pred=b(up)=11 11 12 -> 12 12 13
    #   i>=3: a=12 12 13, b=13 13 14, c=11 11 12; p=a+b-c=14 14 15
    #      pa=2, pb=1, pc=3 -> pred=b -> 14 14 15
    png = _png(
        2,
        5,
        [
            (0, [10, 20, 30, 40, 50, 60]),
            (1, [1, 2, 3, 5, 5, 5]),
            (2, [1, 1, 1, 1, 1, 1]),
            (3, [10, 10, 10, 4, 4, 4]),
            (4, [1, 1, 1, 1, 1, 1]),
        ],
    )
    got = decode_png(png)
    assert (got["width"], got["height"]) == (2, 5)
    expect = (
        [10, 20, 30, 40, 50, 60]
        + [1, 2, 3, 6, 7, 8]
        + [2, 3, 4, 7, 8, 9]
        + [11, 11, 12, 13, 13, 14]
        + [12, 12, 13, 14, 14, 15]
    )
    assert got["n_pixel_bytes"] == len(expect)
    assert got["pixel_checksum"] == sum(expect) % 1000000007


def test_png_decoder_rejects_corruption():
    from minimapreduce_spark.operators.multimodal import decode_png

    good = _png(1, 1, [(0, [1, 2, 3])])
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(bad_crc))
    import struct
    import zlib

    # truncated inflate stream: declare 2 rows but provide 1
    with pytest.raises(ValueError, match="does not match"):
        decode_png(_png(1, 2, [(0, [1, 2, 3])]))


def test_media_lanes_enforce_ascii_contract():
    import pandas as pd
    import pytest

    from minimapreduce_spark.operators.multimodal import encode_png, encode_ppm

    for enc in (encode_png, encode_ppm):
        with pytest.raises(ValueError, match="non-empty ASCII"):
            list(enc(iter([pd.DataFrame({"doc_id": [1], "text": [""]})])))
        with pytest.raises(ValueError, match="non-empty ASCII"):
            list(enc(iter([pd.DataFrame({"doc_id": [1], "text": ["héllo"]})])))


def test_ivf_nprobe_recall_is_monotone(spark):
    """nprobe=2 scans a superset of nprobe=1's candidates, so its
    recall vs brute force must be at least as high — the dial the
    operator exists to expose — and meaningfully above the nprobe=1
    floor on this corpus."""
    from minimapreduce_spark import queries as q

    brute = {
        (r.q_vec_id, r.neighbor_id)
        for r in q.queries()["ann_cosine_topk"](spark, SF_DIR).collect()
    }
    p1 = {
        (r.q_vec_id, r.neighbor_id)
        for r in q.queries()["ann_ivf_topk"](spark, SF_DIR).collect()
    }
    p2 = {
        (r.q_vec_id, r.neighbor_id)
        for r in q.queries()["ann_ivf_nprobe_topk"](spark, SF_DIR).collect()
    }
    r1 = len(p1 & brute) / len(p1)
    r2 = len(p2 & brute) / len(p2)
    assert r2 >= r1, (r1, r2)
    assert r2 >= 0.4, f"nprobe=2 recall collapsed: {r2:.2f}"
    # (note: per-element monotonicity does NOT hold — a second-partition
    # candidate can displace an nprobe=1 hit from the top-5 cut; only
    # the candidate SET is a superset, hence the recall comparison)


def test_graph_greedy_search_semantics(spark):
    """The IVF-routed greedy walk must be a genuine search, not a
    degenerate one (the first cut marched back to cosine(q, q) = 1 and
    still hash-matched its oracle, because the oracle replayed the same
    broken walk — THIS test is the semantic gate): no query may find
    itself, a healthy share of walks must improve past the entry
    vertex, and the 3-hop walk must reach the exact in-cell top-1 for
    a meaningful fraction of queries."""
    import numpy as np
    import pyarrow.parquet as pq

    from minimapreduce_spark import queries as q

    out = {
        r.q_vec_id: (r.found_id, r.cosine_sim)
        for r in q.queries()["ann_graph_greedy_search"](spark, SF_DIR).collect()
    }
    assert len(out) == 20
    assert all(fid != qid for qid, (fid, _) in out.items()), "walk found the query itself"

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    labels = t["label"].to_numpy()
    id2i = {v: i for i, v in enumerate(ids)}
    hits = improved = 0
    for qid, (fid, c) in out.items():
        qi = id2i[qid]
        cell = np.where((labels == labels[qi]) & (ids != qid))[0]
        cos = np.round(En[cell] @ En[qi], 6)
        best = cell[np.lexsort((ids[cell], -cos))][0]
        hits += fid == ids[best]
        entry = cell[np.argmin(ids[cell])]
        improved += c > round(float(En[entry] @ En[qi]), 6)
        # the reported cosine must be the real rounded cosine of the pair
        assert abs(c - round(float(En[id2i[fid]] @ En[qi]), 6)) < 1e-9
    assert improved >= 10, f"only {improved}/20 walks improved past the entry"
    assert hits >= 5, f"greedy recall@1 collapsed: {hits}/20"


def test_knn_edge_scores_clear_rounding_boundaries():
    """kNN-edge twin of test_embedding_lsh_scores_clear_rounding_
    boundaries (round-4 ADVICE): ann_graph_greedy_search's walk
    arithmetic is bit-reproducible cross-engine, but the EDGE SET it
    consumes comes from ann_knn_graph_edges, whose within-cell cosine
    is a numpy normalize-then-matmul rounded to 6 dp versus the
    oracle's list_cosine_similarity — an ulp disagreement exactly on a
    6-dp rounding midpoint could flip an edge's rounded score, reorder
    the round-then-rank top-K, and cascade into the walk. A flip needs
    the raw score within a few double ulps (~1e-16) of a midpoint;
    assert EVERY within-cell pair in the fixture clears its nearest
    midpoint by >= 1e-13. Also pin the top-K keep margin: the
    applyInPandas stage keeps rows within 2e-6 of the k-th raw score
    before the canonical JVM round+rank, so a raw score must not sit
    within ulp of that cut either."""
    import numpy as np
    import pyarrow.parquet as pq

    from minimapreduce_spark.operators.similarity import KNN_GRAPH_K

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    labels = t["label"].to_numpy()
    worst_mid = np.inf
    worst_cut = np.inf
    for lab in np.unique(labels):
        cell = np.where(labels == lab)[0]
        S = En[cell] @ En[cell].T
        np.fill_diagonal(S, -np.inf)
        raw = S[np.isfinite(S)]
        # distance to the nearest 6-dp rounding midpoint, raw units
        worst_mid = min(worst_mid, float(np.abs((raw * 1e6) % 1.0 - 0.5).min() * 1e-6))
        # distance of every raw score to each row's keep cut (kth - 2e-6)
        n = len(cell)
        k = min(KNN_GRAPH_K, n - 1)
        if k > 0:
            kth = np.partition(S, n - 1 - k, axis=1)[:, n - 1 - k]
            d = np.abs(S - (kth - 2e-6)[:, None])
            worst_cut = min(worst_cut, float(d[np.isfinite(S)].min()))
    assert worst_mid > 1e-13, f"edge score within {worst_mid:.2e} of a rounding midpoint"
    assert worst_cut > 1e-13, f"edge score within {worst_cut:.2e} of the top-K keep cut"


def test_graph_hierarchical_search_semantics(spark):
    """The 2-layer walk (coarse rep graph → descend → cell graph) must
    be at least as good a search as the flat label-routed walk — on the
    objective the walk optimizes (the found vertex's rounded cosine),
    because top-1 identity recall is meaningless on this fixture: the
    embeddings are near-random (best cosines ~0.2), so BOTH walks
    plateau at local maxima far from the global argmax, and the global
    argmax frequently lives outside the query's stored cell entirely.
    What the hierarchy must demonstrate: it discovers routing WITHOUT
    the stored label and that routing is no worse — and it may be
    better, precisely when the coarse walk escapes to a cell whose rep
    attracts the query more than its own (measured: it does, for half
    the queries, and mean found cosine strictly improves)."""
    from minimapreduce_spark import queries as q

    import numpy as np
    import pyarrow.parquet as pq

    flat = {
        r.q_vec_id: (r.found_id, r.cosine_sim)
        for r in q.queries()["ann_graph_greedy_search"](spark, SF_DIR).collect()
    }
    hier = {
        r.q_vec_id: (r.found_id, r.cosine_sim)
        for r in q.queries()["ann_graph_hierarchical_search"](spark, SF_DIR).collect()
    }
    assert len(hier) == 20 and set(hier) == set(flat)
    assert all(fid != qid for qid, (fid, _) in hier.items()), "walk found the query itself"

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    id2i = {v: i for i, v in enumerate(t["vec_id"].to_numpy())}
    # the reported cosine must be the real rounded cosine of the pair
    for qid, (fid, c) in hier.items():
        assert abs(c - round(float(En[id2i[fid]] @ En[id2i[qid]]), 6)) < 1e-9
    # objective parity: the discovered routing is no worse than label
    # routing in aggregate, and not worse for most queries individually
    mean_flat = sum(c for _, c in flat.values()) / len(flat)
    mean_hier = sum(c for _, c in hier.values()) / len(hier)
    assert mean_hier >= mean_flat, (mean_hier, mean_flat)
    at_least = sum(hier[qid][1] >= flat[qid][1] for qid in hier)
    assert at_least >= 12, f"hierarchy beat/met flat on only {at_least}/20 queries"


def test_ivfpq_recall_and_cell_invariants(spark):
    """Residual IVF-PQ semantics beyond the hash match:
      - every neighbor comes from ONE cell per query (the routed one) —
        the pruning contract;
      - no query finds itself;
      - recall@5 vs the exact-in-cell IVF truth (`ann_ivf_topk` — the
        honest baseline: same routing, exact float scoring) clears a
        floor well above chance. On this near-isotropic fixture the
        LABEL cells carry no geometry, so routing alone caps recall vs
        the global exact top-5 at ~0.14 (ann_ivf_topk's own number);
        measured: ivfpq-vs-ivf 0.48, ivfpq-vs-exact 0.11. Floors: 0.25
        and 0.04 (chance ≈ 0.01). The clustered-corpus test below shows
        both near 1.0 when cells are real."""
    from minimapreduce_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
        ann_ivfpq_topk,
    )

    pq = ann_ivfpq_topk(spark, SF_DIR).toPandas()
    assert (pq["q_vec_id"] != pq["neighbor_id"]).all(), "self-find"

    import pyarrow.parquet as pa

    lab = (
        pa.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "label"])
        .to_pandas()
        .set_index("vec_id")["label"]
    )
    cells_per_q = (
        pq.assign(nl=pq["neighbor_id"].map(lab)).groupby("q_vec_id")["nl"].nunique()
    )
    assert (cells_per_q == 1).all(), "neighbors leaked across cells"

    def recall(got_df, truth_df):
        num = den = 0
        for qid, grp in truth_df.groupby("q_vec_id"):
            truth = set(grp["neighbor_id"])
            got = set(got_df[got_df["q_vec_id"] == qid]["neighbor_id"])
            num += len(truth & got)
            den += len(truth)
        assert den > 0
        return num / den

    ivf = ann_ivf_topk(spark, SF_DIR).toPandas()
    bf = ann_cosine_topk(spark, SF_DIR).toPandas()
    r_vs_ivf = recall(pq, ivf)
    r_vs_exact = recall(pq, bf[bf["rn"] <= 5])
    assert r_vs_ivf >= 0.25, f"quantization-given-routing recall: {r_vs_ivf:.2f}"
    assert r_vs_exact >= 0.04, f"end-to-end recall below chance band: {r_vs_exact:.2f}"


def test_ivfpq_exact_decomposition_replay(spark):
    """Replay the ADC decomposition in numpy and require every output
    similarity to agree to within the 6-dp rounding quantum: rebuild
    the grid vectors, the per-label exact-floor centroids, the residual
    codebooks (via the operator's OWN training helpers, so a stale
    recipe cannot self-validate), re-encode, reconstruct x̂ = c + r̂ in
    int64, and check sim ≈ dot(q, x̂)/(‖q‖·‖x̂‖). A wrong cross term or
    norm table would shift scores by ≫ 1e-6; the tolerance only
    absorbs HALF_UP-vs-half-even at the 6th decimal."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        PQ_M,
        PQ_SUB,
        _pq_assign,
        _pq_train,
        ann_ivfpq_topk,
    )
    from pyspark.sql import functions as F

    out = ann_ivfpq_topk(spark, SF_DIR).toPandas()

    tbl = pa.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).to_pandas()
    tbl = tbl.sort_values("vec_id").reset_index(drop=True)
    E = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    # Decimal-style HALF_UP on the 1e-4 grid, matching F.round(x*1e4)
    sc = E * 10000.0
    eq = (np.floor(np.abs(sc) + 0.5) * np.sign(sc)).astype(np.int64)
    labels = tbl["label"].to_numpy()
    cg = {}
    for l in np.unique(labels):
        members = eq[labels == l]
        cg[l] = np.floor(members.sum(axis=0) / len(members)).astype(np.int64)
    res = eq - np.stack([cg[l] for l in labels])

    # residual subvectors → the operator's own train/encode helpers
    rows = []
    vid = tbl["vec_id"].to_numpy()
    import pandas as pd

    for m in range(PQ_M):
        rows.append(
            pd.DataFrame(
                {
                    "vec_id": vid,
                    "m": np.int64(m),
                    "sq": list(res[:, m * PQ_SUB : (m + 1) * PQ_SUB]),
                }
            )
        )
    rsub_pdf = pd.concat(rows, ignore_index=True)
    rsub = spark.createDataFrame(rsub_pdf).select(
        "vec_id", "m", F.col("sq").cast("array<bigint>").alias("sq")
    )
    cb = _pq_train(spark, SF_DIR, rsub)
    codes = _pq_assign(rsub, cb, keep_sq=False).toPandas()
    cb_pdf = cb.toPandas()
    ce = {
        (int(r["m"]), int(r["cid"])): np.asarray(r["ce"], dtype=np.int64)
        for _, r in cb_pdf.iterrows()
    }
    code_map = {
        v: g.sort_values("m")["cid"].to_numpy()
        for v, g in codes.groupby("vec_id")
    }
    # reconstruct and compare every output row
    idx = {int(v): i for i, v in enumerate(vid)}
    for _, r in out.iterrows():
        qi, ni = idx[int(r["q_vec_id"])], idx[int(r["neighbor_id"])]
        rhat = np.concatenate(
            [ce[(m, int(code_map[int(r["neighbor_id"])][m]))] for m in range(PQ_M)]
        )
        xhat = cg[labels[ni]] + rhat
        sim = float(eq[qi] @ xhat) / (
            np.sqrt(float(eq[qi] @ eq[qi])) * np.sqrt(float(xhat @ xhat))
        )
        assert abs(sim - r["ivfpq_sim"]) <= 6e-7, (r["q_vec_id"], r["neighbor_id"], sim, r["ivfpq_sim"])


def test_ivfpq_clustered_corpus_routing_and_precision(spark, tmp_path):
    """On the planted 10-cluster corpus (labels = true clusters), IVF
    routing is geometrically real and residual encoding only has to
    resolve within-cluster jitter: every retrieved neighbor must come
    from the query's own cluster AND the similarities must sit in the
    intra-cluster band (≈0.998 — compare flat PQ's 0.5 floor on the
    same corpus: encoding residuals instead of raw vectors is what
    buys the resolution)."""
    import numpy as np
    import pandas as pd

    from minimapreduce_spark.operators.similarity import ann_ivfpq_topk

    rng = np.random.RandomState(7)
    centers = rng.choice([-1.0, 1.0], size=(10, 64))
    vecs = [centers[i % 10] + 0.05 * rng.randn(64) for i in range(500)]
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(500, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.arange(500, dtype=np.int32) % 10,
        }
    )
    d = tmp_path / "clustered_ivfpq"
    d.mkdir()
    pdf.to_parquet(str(d / "embeddings.parquet"), index=False)

    pq = ann_ivfpq_topk(spark, str(d)).toPandas()
    assert len(pq) == 100
    same = (pq["q_vec_id"] % 10 == pq["neighbor_id"] % 10).mean()
    assert same == 1.0, f"cross-cluster retrievals: precision {same:.2f}"
    assert (pq["ivfpq_sim"] > 0.99).all(), pq["ivfpq_sim"].min()


def test_ivfpq_served_artifact_equals_inline_and_plan_has_no_training(spark, tmp_path):
    """The train-once/serve-many contract of `ann_ivfpq_served_topk`:

      - the persisted artifact's three tables are ROW-IDENTICAL to a
        fresh `_ivfpq_index_frames` recompute (the artifact is a pure
        function of the fixture — what makes the shared recompute
        oracle valid), cross-checked through DuckDB reading the
        artifact parquet directly;
      - the served top-k equals the inline-trained `ann_ivfpq_topk`
        EXACTLY (same routing, same LUT, same ADC — only the index
        source differs);
      - the SERVING plan contains zero training: exactly ONE scan of
        the embeddings parquet (the query vectors) vs the inline
        twin's many, and it scans the artifact's codes/centroids/
        codebook paths instead;
      - a rebuild call with the artifact present is a no-op (returns
        without retraining — mtimes unchanged)."""
    import duckdb
    import os as _os

    from minimapreduce_spark import plans
    from minimapreduce_spark.operators.similarity import (
        _ivfpq_index_frames,
        ann_ivfpq_served_topk,
        ann_ivfpq_topk,
        ivfpq_index_build,
    )

    root = ivfpq_index_build(spark, SF_DIR, root=str(tmp_path / "ivfpq_idx"))

    # artifact ≡ recompute, frame by frame, via DuckDB on the parquet
    cg, cb, code_arr = _ivfpq_index_frames(spark, SF_DIR)
    con = duckdb.connect()
    for sub, frame, key in (
        ("centroids", cg, "label"),
        ("codebook", cb, "m, cid"),
        ("codes", code_arr, "vec_id"),
    ):
        art = con.execute(
            f"SELECT * FROM '{root}/{sub}/**/*.parquet' ORDER BY {key}"
        ).df()
        fresh = frame.toPandas().sort_values(key.split(", ")).reset_index(drop=True)
        art = art[fresh.columns].reset_index(drop=True)
        for c in fresh.columns:
            fa = [tuple(v) if hasattr(v, "__len__") else v for v in fresh[c]]
            aa = [tuple(v) if hasattr(v, "__len__") else v for v in art[c]]
            assert fa == aa, f"artifact {sub}.{c} diverges from recompute"
    con.close()

    # served ≡ inline end-to-end
    served = {
        tuple(r) for r in ann_ivfpq_served_topk(spark, SF_DIR).collect()
    }
    inline = {tuple(r) for r in ann_ivfpq_topk(spark, SF_DIR).collect()}
    assert served == inline

    # zero training in the serving plan: exactly ONE embeddings scan
    # (the 20 query vectors), the index read from the artifact parquet,
    # and NO Python stage at all — the training chain's `_pq_assign`
    # encode runs in MapInPandas, so its absence is the structural
    # "no training jobs" witness (the inline twin's plan carries it)
    plan = plans.physical_plan(ann_ivfpq_served_topk(spark, SF_DIR))
    # every parquet scan in the serving plan is an ARTIFACT scan; the
    # embeddings table appears only behind the bounded checkpointed
    # query frame (Scan ExistingRDD), never as a corpus scan
    assert plan.count("embeddings.parquet") == 0
    assert plan.count("minimapreduce_ivfpq_") == plan.count("Location: InMemoryFileIndex")
    assert plan.count("minimapreduce_ivfpq_") >= 3  # codes + codebook + centroids
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
    inline_plan = plans.physical_plan(ann_ivfpq_topk(spark, SF_DIR))
    assert "MapInPandas" in inline_plan

    # rebuild is a no-op when present
    before = _os.stat(root).st_mtime_ns
    assert ivfpq_index_build(spark, SF_DIR, root=root) == root
    assert _os.stat(root).st_mtime_ns == before


def test_retrieval_eval_metrics_replay_and_identity(spark):
    """The IR-metric readout's two pins: (a) recall@K / MRR / NDCG@K
    replay EXACTLY in numpy from the raw frames (truth = brute
    rounded-cosine top-K, system = IVF-routed top-K, discounts from
    the shared `ndcg_discounts` table); (b) the identity sanity — a
    system evaluated against itself scores 1.0 on every metric — here
    realized by checking every query whose routed cell contains its
    full truth set scores exactly (1.0, 1, 1.0) and, since the fixture
    guarantees at least one such query is absent, that metrics degrade
    monotonically with n_hits."""
    import math

    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        IVF_TOP_K,
        N_QUERIES,
        NDCG_SCALE,
        ndcg_discounts,
        retrieval_eval_ivf,
    )

    out = retrieval_eval_ivf(spark, SF_DIR).toPandas().set_index("q_vec_id")
    assert len(out) == N_QUERIES

    tbl = pa.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(tbl["vec_id"])
    labels = np.asarray(tbl["label"])
    E = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    disc = ndcg_discounts()
    idcg = sum(disc)

    # routing replay (the bitext test's centroid discipline)
    uniq = np.unique(labels)
    C = np.stack([E[labels == lab].mean(axis=0) for lab in uniq])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    route = uniq[np.lexsort((uniq[None, :].repeat(len(ids), 0),
                             -np.round(En @ Cn.T, 6)), axis=-1)[:, 0]]

    def topk(q, mask):
        cs = np.round(En[mask] @ En[q], 6)
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, -cs))[:IVF_TOP_K]
        return list(cand_ids[order])

    for qv in range(N_QUERIES):
        qi = int(np.where(ids == qv)[0][0])
        truth = set(topk(qi, ids != qv))
        sys_list = topk(qi, (labels == route[qi]) & (ids != qv))
        hits = [1 if v in truth else 0 for v in sys_list]
        n_hits = sum(hits)
        row = out.loc[qv]
        assert int(row.n_hits) == n_hits, qv
        assert abs(row.recall_at_k - round(n_hits / IVF_TOP_K, 6)) < 1e-12
        if n_hits:
            rf = hits.index(1) + 1
            assert int(row.rank_first) == rf
            assert abs(row.mrr - round(1.0 / rf, 6)) < 1e-12
        else:
            assert math.isnan(row.rank_first) or row.rank_first is None
            assert row.mrr == 0.0
        dcg = sum(d for d, h in zip(disc, hits) if h)
        assert abs(row.ndcg_at_k - round(dcg / idcg, 6)) < 1e-12
        # identity sanity per query: a full sweep (all K hit, in order)
        # would score exactly (1.0, 1, 1.0) under the same formulas
        if hits == [1] * IVF_TOP_K:
            assert (row.recall_at_k, int(row.rank_first), row.ndcg_at_k) == (
                1.0,
                1,
                1.0,
            )
    # the IVF system genuinely degrades on the fixture (the metric is
    # not vacuously 1): some query misses part of its truth set
    assert out.n_hits.min() < IVF_TOP_K
    assert NDCG_SCALE == 10**6


def test_retrieval_eval_ivfpq_dominance_and_consistency(spark):
    """The compressed-system eval's sanity pins: (a) the IVFPQ system
    cannot beat the exact-within-cell IVF router it approximates in
    TOTAL hits (same routing, lossy scores — ADC can only reorder or
    lose in-cell truth, never add out-of-cell truth); (b) per-query
    n_hits/recall agree with a direct set comparison of the registered
    system output vs the brute truth; (c) both evals cover all
    N_QUERIES queries."""
    from minimapreduce_spark.operators.similarity import (
        IVF_TOP_K,
        N_QUERIES,
        ann_cosine_topk,
        ann_ivfpq_topk,
        retrieval_eval_ivf,
        retrieval_eval_ivfpq,
    )

    pq_eval = retrieval_eval_ivfpq(spark, SF_DIR).toPandas().set_index("q_vec_id")
    ivf_eval = retrieval_eval_ivf(spark, SF_DIR).toPandas().set_index("q_vec_id")
    assert len(pq_eval) == len(ivf_eval) == N_QUERIES
    assert pq_eval.n_hits.sum() <= ivf_eval.n_hits.sum()

    truth = ann_cosine_topk(spark, SF_DIR).toPandas()
    truth = truth[truth.rn <= IVF_TOP_K]
    tsets = truth.groupby("q_vec_id")["neighbor_id"].apply(set)
    sysout = ann_ivfpq_topk(spark, SF_DIR).toPandas()
    ssets = sysout.groupby("q_vec_id")["neighbor_id"].apply(set)
    for qv in range(N_QUERIES):
        n = len(ssets.get(qv, set()) & tsets.get(qv, set()))
        assert int(pq_eval.loc[qv].n_hits) == n, qv


def test_ivfpq_append_codebooks_are_physically_frozen(spark, tmp_path):
    """The append rung's whole claim: training NEVER sees the batch.
    Write a corpus with the appended rows physically removed, run the
    full index build on it, and the centroids AND codebooks must equal
    the predicate-trained frames on the complete corpus EXACTLY (same
    integer grids, same seeds, same Lloyd trajectory — zero tolerance).
    Also pins: the appended vectors ARE encoded (code_arr covers the
    full corpus) and the batch is nonempty on the fixture."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from minimapreduce_spark.operators.similarity import (
        APPEND_MOD,
        N_QUERIES,
        _ivfpq_index_frames,
    )

    pred = ~((F.col("vec_id") % APPEND_MOD == 0) & (F.col("vec_id") >= N_QUERIES))
    cg_p, cb_p, codes_p = _ivfpq_index_frames(spark, SF_DIR, train_pred=pred)

    con = duckdb.connect()
    base = con.execute(
        f"""SELECT * FROM '{SF_DIR}/embeddings.parquet'
            WHERE NOT (vec_id % {APPEND_MOD} = 0 AND vec_id >= {N_QUERIES})"""
    ).df()
    n_all, = con.execute(
        f"SELECT count(*) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchone()
    con.close()
    assert 0 < len(base) < n_all, "append batch empty — pin is vacuous"
    d = tmp_path / "frozen_base"
    d.mkdir()
    base.to_parquet(str(d / "embeddings.parquet"), index=False)
    cg_f, cb_f, _ = _ivfpq_index_frames(spark, str(d))

    def rows(df, keys):
        return sorted(
            tuple(tuple(v) if hasattr(v, "__len__") else v for v in r)
            for r in df.toPandas().sort_values(keys).itertuples(index=False)
        )

    assert rows(cg_p, ["label"]) == rows(cg_f, ["label"])
    # codebook CONTENT must be identical per subspace; cid labels may
    # differ (the predicate path numbers seeds over the full id range
    # and lets excluded ones drop out — a gap — while the physical
    # corpus numbers the survivors contiguously; the quantizer, and
    # therefore every encoded vector, is the same either way)
    def cb_content(df):
        out: dict = {}
        for r in df.toPandas().itertuples(index=False):
            out.setdefault(int(r.m), []).append(tuple(r.ce))
        return {m: sorted(v) for m, v in out.items()}

    assert cb_content(cb_p) == cb_content(cb_f)
    assert codes_p.count() == n_all  # the batch IS encoded


def test_ivfpq_physical_append_equals_inline_and_links_not_copies(spark, tmp_path):
    """The PHYSICAL append rung (`ivfpq_index_append` — the artifact
    half of the contract the inline twin only computes): (a) the
    appended artifact's codes are ROW-IDENTICAL to the inline
    frozen-training frames over the full corpus, and its centroids/
    codebook are byte-for-byte the base artifact's files (hardlinks —
    same inode, zero copies, so yesterday's index is provably never
    rewritten); (b) the registered served query equals the inline
    append twin frame-for-frame; (c) the base artifact holds ONLY
    base codes (the batch genuinely arrives via the append, not a
    rebuild in disguise); (d) re-append with the artifact present is
    a metadata no-op."""
    import os as _os

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.similarity import (
        APPEND_MOD,
        N_QUERIES,
        _ivfpq_index_frames,
        ivfpq_base_index_build,
        ivfpq_index_append,
    )

    base_root = ivfpq_base_index_build(spark, SF_DIR, root=str(tmp_path / "base"))
    pred = ~((F.col("vec_id") % APPEND_MOD == 0) & (F.col("vec_id") >= N_QUERIES))
    root = ivfpq_index_append(
        spark, SF_DIR, ~pred, base_root, root=str(tmp_path / "appended")
    )

    # (a) appended codes ≡ inline frozen-training codes, full corpus
    _cg, _cb, codes_inline = _ivfpq_index_frames(spark, SF_DIR, train_pred=pred)

    def rows(df, keys):
        return sorted(
            tuple(tuple(v) if hasattr(v, "__len__") else v for v in r)
            for r in df.toPandas().sort_values(keys).itertuples(index=False)
        )

    codes_art = spark.read.parquet(_os.path.join(root, "codes")).select(
        "vec_id", F.col("label").cast("bigint").alias("label"), "code", "n2hat"
    )
    assert rows(codes_art, ["vec_id"]) == rows(
        codes_inline.select(
            "vec_id", F.col("label").cast("bigint").alias("label"), "code", "n2hat"
        ),
        ["vec_id"],
    )

    # hardlinks: every base data file appears in the appended artifact
    # with st_nlink ≥ 2 and the SAME inode
    linked = 0
    for sub in ("codes", "centroids", "codebook"):
        src_dir = _os.path.join(base_root, sub)
        for dirpath, _dirs, files in _os.walk(src_dir):
            rel = _os.path.relpath(dirpath, src_dir)
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                dst = _os.path.join(
                    root, sub, "" if rel == "." else rel, f"base-{f}"
                )
                assert _os.path.exists(dst), f"base file not folded in: {dst}"
                assert (
                    _os.stat(dst).st_ino == _os.stat(_os.path.join(dirpath, f)).st_ino
                ), "copied, not hardlinked"
                linked += 1
    assert linked >= 3

    # (b) served-from-appended ≡ inline append twin
    got = {
        tuple(r)
        for r in q.queries()["ann_ivfpq_append_served_topk"](spark, SF_DIR).collect()
    }
    want = {
        tuple(r) for r in q.queries()["ann_ivfpq_append_serve"](spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0

    # (c) base artifact excludes the batch
    base_ids = {
        r.vec_id
        for r in spark.read.parquet(_os.path.join(base_root, "codes"))
        .select("vec_id")
        .collect()
    }
    batch_ids = {i for i in base_ids if i % APPEND_MOD == 0 and i >= N_QUERIES}
    assert not batch_ids, "base artifact contains batch codes"
    art_ids = {r.vec_id for r in codes_art.select("vec_id").collect()}
    assert art_ids > base_ids, "append added nothing"

    # (d) idempotent re-append
    before = _os.stat(root).st_mtime_ns
    assert ivfpq_index_append(spark, SF_DIR, ~pred, base_root, root=root) == root
    assert _os.stat(root).st_mtime_ns == before


def test_ivfpq_compact_content_identical_one_file_per_cell(spark, tmp_path):
    """The ANN compaction rung, mirroring the minhash compaction pins:
    after TWO successive appends (the batch split into two day-halves
    — the fragmentation case), the compacted artifact is ROW-IDENTICAL
    to the fragmented one on all three tables, every cell partition
    holds exactly ONE code file (the fragmented one has >1 in at least
    one cell), the registered compact-served query equals the
    append-served twin frame-for-frame, and re-compaction is a no-op."""
    import os as _os

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.similarity import (
        APPEND_MOD,
        N_QUERIES,
        ivfpq_base_index_build,
        ivfpq_index_append,
        ivfpq_index_compact,
    )

    base_root = ivfpq_base_index_build(spark, SF_DIR, root=str(tmp_path / "base"))
    vid = F.col("vec_id")
    in_batch = (vid % APPEND_MOD == 0) & (vid >= N_QUERIES)
    day1 = in_batch & (vid % (2 * APPEND_MOD) == 0)
    day2 = in_batch & (vid % (2 * APPEND_MOD) != 0)
    a1 = ivfpq_index_append(spark, SF_DIR, day1, base_root, root=str(tmp_path / "a1"))
    a2 = ivfpq_index_append(spark, SF_DIR, day2, a1, root=str(tmp_path / "a2"))
    c = ivfpq_index_compact(spark, a2, out_root=str(tmp_path / "compacted"))

    # content-identical, all three tables
    for sub, keys in (("codes", ["vec_id"]), ("centroids", ["label"]), ("codebook", ["m", "cid"])):
        frag = spark.read.parquet(f"{a2}/{sub}")
        comp = spark.read.parquet(f"{c}/{sub}")
        if sub == "codes":
            cast = lambda d: d.select(  # noqa: E731
                "vec_id", F.col("label").cast("bigint").alias("label"), "code", "n2hat"
            )
            frag, comp = cast(frag), cast(comp)
        rows = lambda d: sorted(  # noqa: E731
            tuple(tuple(v) if hasattr(v, "__len__") else v for v in r)
            for r in d.toPandas().sort_values(keys).itertuples(index=False)
        )
        assert rows(frag) == rows(comp), f"compaction changed {sub} content"

    # exactly one code file per cell partition; fragmented has >1 somewhere
    def files_per_cell(root):
        out = {}
        cdir = _os.path.join(root, "codes")
        for d in _os.listdir(cdir):
            if d.startswith("label="):
                out[d] = sum(
                    1
                    for f in _os.listdir(_os.path.join(cdir, d))
                    if f.endswith(".parquet")
                )
        return out

    frag_counts = files_per_cell(a2)
    comp_counts = files_per_cell(c)
    assert set(frag_counts) == set(comp_counts)
    assert all(n == 1 for n in comp_counts.values()), comp_counts
    assert any(n > 1 for n in frag_counts.values()), (
        "two appends should fragment at least one cell"
    )

    # registered compact-served ≡ append-served twin
    got = {
        tuple(r)
        for r in q.queries()["ann_ivfpq_compact_served_topk"](spark, SF_DIR).collect()
    }
    want = {
        tuple(r)
        for r in q.queries()["ann_ivfpq_append_served_topk"](spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0

    # re-compaction no-op
    before = _os.stat(c).st_mtime_ns
    assert ivfpq_index_compact(spark, a2, out_root=c) == c
    assert _os.stat(c).st_mtime_ns == before


def test_quality_linear_probe_learns_and_solve_is_faithful(spark):
    """The trained probe must actually LEARN (accuracy vs the weak
    label well above the majority class — a degenerate all-keep model
    would still hash-match a faithfully degenerate oracle), and the
    generated Cramer's-rule expression text must be a faithful 4x4
    solve: recompute the ridge normal equations in numpy from the same
    features and require the implied scores to agree to float noise."""
    import numpy as np

    from minimapreduce_spark.operators.pipeline import quality_linear_probe

    out = quality_linear_probe(spark, SF_DIR).toPandas()
    pos = out["y"].mean()
    majority = max(pos, 1 - pos)
    acc = (out["keep"] == out["y"]).mean()
    assert acc >= 0.9, f"probe accuracy {acc:.3f}"
    assert acc > majority + 0.1, f"not better than majority: {acc:.3f} vs {majority:.3f}"
    # scores are probabilities-ish but unclipped LPM values; the keep
    # rule must be exactly score >= 0.5 on the UNROUNDED score — check
    # consistency on the rounded column away from the boundary
    away = out[(out["score"] - 0.5).abs() > 1e-5]
    assert ((away["score"] >= 0.5) == (away["keep"] == 1)).all()

    # numpy replay of the solve over the same features
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    from minimapreduce_spark.operators.text_analysis import EN_STOP

    feats = con.execute(f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), w -> w <> '') AS ws
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN 0.5 * least(len(ws) / 100.0, 1.0)
                       + 0.3 * (1.0 - len(list_filter(ws, w -> w IN {EN_STOP!r})) * 1.0 / len(ws))
                       + 0.2 * (len(list_distinct(ws)) * 1.0 / len(ws)) >= 0.72
                    THEN 1 ELSE 0 END AS y,
               1.0 AS x0, least(len(ws), 200) / 200.0 AS x1,
               len(list_filter(ws, w -> w IN {EN_STOP!r})) * 1.0 / len(ws) AS x2,
               len(list_distinct(ws)) * 1.0 / len(ws) AS x3
        FROM toks WHERE len(ws) > 0
    """).df()
    X = feats[["x0", "x1", "x2", "x3"]].to_numpy()
    y = feats["y"].to_numpy().astype(float)
    n = len(y)
    A = (X.T @ X) / n + 1e-6 * np.eye(4)
    b = (X.T @ y) / n
    w = np.linalg.solve(A, b)
    z = X @ w
    replay = feats[["doc_id"]].assign(z=z).set_index("doc_id")["z"]
    got = out.set_index("doc_id")["score"]
    diff = (replay.loc[got.index] - got).abs().max()
    # the engine's moments are 1e-9-grid-rounded and its solve is the
    # generated cofactor text; agreement to ~1e-5 proves the formula is
    # the right algebra (a transposed cofactor or sign slip shifts
    # scores by O(1))
    assert diff <= 1e-4, f"solve replay diverges: {diff}"


def test_kcenter_coreset_invariants_and_planted_clusters(spark, tmp_path):
    """Greedy k-center semantics beyond the hash match:
      - the covering-radius sequence d2_sel is strictly decreasing
        (each pick is the farthest remaining point, so the max-min
        distance can only shrink) and sel_rank is exactly 1..k;
      - on the planted 10-cluster corpus, k=10 selects EXACTLY one
        center per cluster — the defining farthest-point property
        (cross-cluster d² ≫ intra-cluster jitter, so the greedy
        traversal must exhaust all clusters before doubling up)."""
    import numpy as np
    import pandas as pd

    from minimapreduce_spark.operators.similarity import (
        KC_K,
        embedding_kcenter_coreset,
        kcenter_select,
    )

    out = embedding_kcenter_coreset(spark, SF_DIR).toPandas().sort_values("sel_rank")
    assert list(out["sel_rank"]) == list(range(1, KC_K + 1))
    assert out["vec_id"].is_unique
    radii = out["d2_sel"].dropna().to_numpy()
    assert len(radii) == KC_K - 1
    assert (np.diff(radii) < 0).all(), "covering radius must strictly shrink"

    rng = np.random.RandomState(7)
    centers = rng.choice([-1.0, 1.0], size=(10, 64))
    vecs = [centers[i % 10] + 0.05 * rng.randn(64) for i in range(500)]
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(500, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.arange(500, dtype=np.int32) % 10,
        }
    )
    d = tmp_path / "clustered_kcenter"
    d.mkdir()
    pdf.to_parquet(str(d / "embeddings.parquet"), index=False)
    sel = kcenter_select(spark, str(d), 10).toPandas()
    got_clusters = sorted(sel["vec_id"] % 10)
    assert got_clusters == list(range(10)), f"cluster coverage: {got_clusters}"


def test_mmr_rerank_reduces_redundancy(spark):
    """MMR semantics beyond the hash match:
      - sel_rank 1 is exactly the top relevance candidate (the greedy
        seed is pure relevance);
      - every selection comes from the top-MMR_CANDS relevance pool;
      - the POINT of MMR: the mean pairwise cosine among the 5 selected
        is <= the mean among the top-5-by-relevance for EVERY query,
        and strictly lower in aggregate (measured 0.036 vs 0.096 on
        this fixture — a 63% redundancy cut for the same pool)."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        MMR_CANDS,
        ann_cosine_topk,
        ann_mmr_rerank,
    )

    mmr = ann_mmr_rerank(spark, SF_DIR).toPandas()
    bf = ann_cosine_topk(spark, SF_DIR).toPandas()

    top1 = bf[bf["rn"] == 1].set_index("q_vec_id")["neighbor_id"]
    r1 = mmr[mmr["sel_rank"] == 1].set_index("q_vec_id")["neighbor_id"]
    assert (top1.loc[r1.index] == r1).all(), "greedy seed must be pure relevance"

    tbl = (
        pa.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
    )
    E = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    idx = {int(v): i for i, v in enumerate(tbl["vec_id"])}
    vids = tbl["vec_id"].to_numpy()

    # selections must come from the top-MMR_CANDS relevance pool
    # (numpy replay; a 1e-9 band absorbs the engines' 6-dp rounding at
    # the pool's cut line)
    for qid, grp in mmr.groupby("q_vec_id"):
        cos = En[idx[qid]] @ En.T
        cos[idx[qid]] = -2.0
        cut = np.sort(cos)[::-1][MMR_CANDS - 1]
        pool = set(vids[cos >= cut - 1e-9])
        assert set(grp["neighbor_id"]) <= pool, qid

    def mean_pairwise(ids):
        V = En[[idx[i] for i in ids]]
        S = V @ V.T
        iu = np.triu_indices(len(ids), 1)
        return S[iu].mean()

    d_mmr, d_rel = [], []
    for qid, grp in mmr.groupby("q_vec_id"):
        d_mmr.append(mean_pairwise(list(grp["neighbor_id"])))
        d_rel.append(
            mean_pairwise(
                list(bf[(bf["q_vec_id"] == qid) & (bf["rn"] <= 5)]["neighbor_id"])
            )
        )
    assert all(m <= r + 1e-12 for m, r in zip(d_mmr, d_rel))
    assert float(np.mean(d_mmr)) < float(np.mean(d_rel)) * 0.75, (
        np.mean(d_mmr),
        np.mean(d_rel),
    )


def test_ivf_mmr_composition(spark):
    """The composed serving rung (IVF routing → MMR rerank) beyond the
    hash match:
      - the greedy seed equals ann_ivf_topk's rank-1 neighbor — same
        routing, same relevance grid, same tie-breaks;
      - every selection lies in the query's single routed cell (the
        cell invariant the IVF family pins) AND inside that cell's
        top-MMR_CANDS relevance pool;
      - the rerank still earns its keep inside the cell: vs the in-cell
        top-5-by-relevance (= ann_ivf_topk's output), mean pairwise
        cosine among the 5 selections drops for >= 90% of queries and
        strictly in aggregate (measured 0.053 -> -0.010 on this
        fixture). Unlike the brute-pool twin, per-query monotonicity is
        NOT asserted: MMR trades redundancy against relevance greedily,
        and inside a 50-vector cell one query legitimately comes out
        +0.002 — the aggregate is the contract."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        MMR_CANDS,
        ann_ivf_mmr_rerank,
        ann_ivf_topk,
    )

    out = ann_ivf_mmr_rerank(spark, SF_DIR).toPandas()
    ivf = ann_ivf_topk(spark, SF_DIR).toPandas()

    top1 = ivf[ivf["rn"] == 1].set_index("q_vec_id")["neighbor_id"]
    r1 = out[out["sel_rank"] == 1].set_index("q_vec_id")["neighbor_id"]
    assert (top1.loc[r1.index] == r1).all(), "greedy seed must be the routed top-1"

    tbl = (
        pa.read_table(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    lab = tbl.set_index("vec_id")["label"]
    E = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    idx = {int(v): i for i, v in enumerate(tbl["vec_id"])}
    vids = tbl["vec_id"].to_numpy()
    labs = tbl["label"].to_numpy()

    for qid, grp in out.groupby("q_vec_id"):
        cell = lab.loc[top1.loc[qid]]  # the routed cell's label
        assert (lab.loc[grp["neighbor_id"]] == cell).all(), qid
        # in-cell relevance pool (numpy replay; 1e-9 band absorbs the
        # engines' 6-dp rounding at the pool's cut line)
        cos = En[idx[qid]] @ En.T
        mask = (labs == cell) & (vids != qid)
        incell = np.sort(cos[mask])[::-1]
        cut = incell[min(MMR_CANDS, len(incell)) - 1]
        pool = set(vids[mask & (cos >= cut - 1e-9)])
        assert set(grp["neighbor_id"]) <= pool, qid

    def mean_pairwise(ids):
        V = En[[idx[i] for i in ids]]
        S = V @ V.T
        iu = np.triu_indices(len(ids), 1)
        return S[iu].mean()

    d_mmr, d_rel = [], []
    for qid, grp in out.groupby("q_vec_id"):
        d_mmr.append(mean_pairwise(list(grp["neighbor_id"])))
        d_rel.append(
            mean_pairwise(
                list(ivf[(ivf["q_vec_id"] == qid) & (ivf["rn"] <= 5)]["neighbor_id"])
            )
        )
    improved = sum(m <= r + 1e-12 for m, r in zip(d_mmr, d_rel))
    assert improved >= 0.9 * len(d_mmr), (improved, len(d_mmr))
    assert float(np.mean(d_mmr)) < float(np.mean(d_rel)), (
        np.mean(d_mmr),
        np.mean(d_rel),
    )


def test_hybrid_rrf_fusion_planted(spark, tmp_path):
    """RRF semantics on a planted corpus: a document ranked 2 in BOTH
    channels must beat the documents ranked 1 in only one channel
    (2·⌊S/62⌋ > ⌊S/61⌋), single-channel rank-1 docs tie and break by
    doc_id, and every row's rrf_score must equal the hand-computed
    integer contributions of its printed ranks."""
    import os

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.similarity import (
        HY_NQ,
        HY_RRF_K,
        HY_RRF_SCALE,
    )

    docs, embs = [], []
    # query docs 0..HY_NQ-1: q0 is the probe, the rest are inert
    docs.append((0, "alpha beta", "en", "plant", 10))
    embs.append((0, [1.0, 0.0, 0.0, 0.0], 0))
    for i in range(1, HY_NQ):
        docs.append((i, f"qfiller{i} qfiller{i}", "en", "plant", 10))
        embs.append((i, [0.0, 0.0, 1.0, float(i)], 0))
    # doc A (id 10): lexical rank 1 only (identical text, orthogonal emb)
    docs.append((10, "alpha beta", "en", "plant", 10))
    embs.append((10, [0.0, 1.0, 0.0, 0.0], 1))
    # doc X (id 11): rank 2 in BOTH channels
    docs.append((11, "alpha beta xgram", "en", "plant", 16))
    embs.append((11, [1.0, 0.35, 0.0, 0.0], 1))
    # doc B (id 12): semantic rank 1 only (near-parallel emb, alien text)
    docs.append((12, "bgram bgram", "en", "plant", 11))
    embs.append((12, [1.0, 0.05, 0.0, 0.0], 1))
    # 24 fillers: disjoint vocab (never lexical candidates), sem cosine
    # strictly between X's and A's 0 so A falls outside the sem top-20
    for j in range(24):
        docs.append((20 + j, f"filler{j} filler{j} filler{j}", "en", "plant", 20))
        embs.append((20 + j, [1.0, 1.0 + j * 0.05, 0.0, 0.0], 2))
    d = str(tmp_path / "rrf_planted")
    os.makedirs(d)
    spark.createDataFrame(
        docs, "doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id: bigint, embedding: array<float>, label: int"
    ).withColumn("embedding", F.col("embedding").cast("array<float>")).write.parquet(
        os.path.join(d, "embeddings.parquet")
    )

    out = q.REGISTRY["hybrid_rrf_retrieval"].fn(spark, d).toPandas()
    q0 = out[out.q_doc_id == 0].sort_values("fused_rank").reset_index(drop=True)

    c = lambda r: HY_RRF_SCALE // (int(r) + HY_RRF_K)  # noqa: E731
    # X fused first on two rank-2 hits; A and B rank-1 singles tie, id order
    assert list(q0.doc_id[:3]) == [11, 10, 12], q0.head(6)
    assert (q0.lex_rank[0], q0.sem_rank[0]) == (2, 2)
    assert q0.rrf_score[0] == 2 * c(2)
    assert q0.rrf_score[1] == q0.rrf_score[2] == c(1)
    assert 2 * c(2) > c(1), "RRF discretization must preserve the fusion win"
    # every output row's score is exactly the sum of its printed ranks'
    # integer contributions (channel miss = 0) — oracle-independent
    for row in out.itertuples():
        want = (0 if row.lex_rank != row.lex_rank else c(row.lex_rank)) + (
            0 if row.sem_rank != row.sem_rank else c(row.sem_rank)
        )
        assert row.rrf_score == want, row
    # A must be OUTSIDE the semantic candidate set (that's what makes it
    # a single-channel hit): its sem_rank column is NaN
    assert q0[q0.doc_id == 10].sem_rank.isna().all()
    assert q0[q0.doc_id == 12].lex_rank.isna().all()


def test_hybrid_ivf_composition_invariants(spark):
    """The IVF-routed hybrid must differ from the brute hybrid ONLY in
    the semantic candidate pool: (a) every row's integer RRF score
    recomputes from its printed ranks; (b) each query's semantic
    candidates all come from ONE IVF cell (the routing invariant);
    (c) the lexical channel is byte-identical between the variants."""
    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.similarity import HY_RRF_K, HY_RRF_SCALE
    from tests.conftest import SF_DIR

    ivf = q.REGISTRY["hybrid_ivf_rrf_retrieval"].fn(spark, SF_DIR).toPandas()
    brute = q.REGISTRY["hybrid_rrf_retrieval"].fn(spark, SF_DIR).toPandas()

    c = lambda r: HY_RRF_SCALE // (int(r) + HY_RRF_K)  # noqa: E731
    for row in ivf.itertuples():
        want = (0 if row.lex_rank != row.lex_rank else c(row.lex_rank)) + (
            0 if row.sem_rank != row.sem_rank else c(row.sem_rank)
        )
        assert row.rrf_score == want, row

    labels = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(F.col("vec_id").alias("doc_id"), "label")
        .toPandas()
        .set_index("doc_id")["label"]
    )
    sem_hits = ivf[ivf.sem_rank.notna()]
    for qid, grp in sem_hits.groupby("q_doc_id"):
        cells = {labels[d] for d in grp.doc_id}
        assert len(cells) == 1, (qid, cells)

    # lexical channel identical: same (q, doc, lex_rank) triples among
    # rows where the lexical channel fired
    key = lambda df: set(  # noqa: E731
        map(tuple, df[df.lex_rank.notna()][["q_doc_id", "doc_id", "lex_rank"]].values)
    )
    # the fused top-10 cut can admit different rows, so compare on the
    # intersection of docs present in both outputs
    both = set(map(tuple, ivf[["q_doc_id", "doc_id"]].values)) & set(
        map(tuple, brute[["q_doc_id", "doc_id"]].values)
    )
    li = {(r.q_doc_id, r.doc_id): r.lex_rank for r in ivf.itertuples() if (r.q_doc_id, r.doc_id) in both}
    lb = {(r.q_doc_id, r.doc_id): r.lex_rank for r in brute.itertuples() if (r.q_doc_id, r.doc_id) in both}
    for k in li:
        a, b = li[k], lb[k]
        assert (a != a and b != b) or a == b, (k, a, b)


def test_log_quantization_margins(spark):
    """The round-5 LSH lesson applied to every round-6 ln-quantization
    site: a quantized log (round(ln(x)·SCALE)) is cross-engine exact
    only while no operand sits ON a rounding midpoint, where a 1-ulp
    JVM-vs-DuckDB ln() disagreement could flip the integer. Pin the
    midpoint margin for (a) DSIR bucket log-ratios, (b) unigram-LM
    piece log-probs (all rounds, from the registered output's own
    count columns), (c) the hybrid/TF-IDF IDF weights. Margins on this
    fixture are ≥1e-9 in quantized units — ~four orders of magnitude
    above double-ulp scale."""
    import math

    import numpy as np

    import duckdb

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.pipeline import DSIR_B, DSIR_LR_SCALE
    from minimapreduce_spark.operators.text_analysis import UNI_LP_SCALE
    from tests.conftest import SF_DIR, TABLES, table_path

    def midpoint_margin(xs):
        xs = np.asarray(sorted(xs), dtype=np.float64)
        return np.abs(np.mod(xs, 1.0) - 0.5).min()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'"
        )

    # (a) DSIR: ratio operands recomputed exactly from integer counts
    rows = con.execute(f"""
        WITH toks AS (
          SELECT doc_id, (lang = 'en' AND source IN ('src0','src1','src2','src3')) AS is_tgt,
                 unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), w -> w <> '')) AS word
          FROM documents
        ),
        b AS (SELECT is_tgt,
                     CAST(('0x' || substr(md5('dsir:' || word), 1, 15)) AS BIGINT) % {DSIR_B} AS bucket,
                     count(*) AS c
              FROM toks GROUP BY 1, 2),
        t AS (SELECT bucket, sum(c) AS tb FROM b WHERE is_tgt GROUP BY 1),
        r AS (SELECT bucket, sum(c) AS rb FROM b WHERE NOT is_tgt GROUP BY 1),
        tot AS (SELECT (SELECT coalesce(sum(tb),0) FROM t) tt, (SELECT coalesce(sum(rb),0) FROM r) rt)
        SELECT COALESCE(t.tb, 0), COALESCE(r.rb, 0), tot.tt, tot.rt
        FROM t FULL JOIN r ON t.bucket = r.bucket, tot
    """).fetchall()
    xs = [
        math.log(((tb + 1) * (rt + DSIR_B)) / ((rb + 1) * (tt + DSIR_B))) * DSIR_LR_SCALE
        for tb, rb, tt, rt in rows
    ]
    assert midpoint_margin(xs) > 1e-9, "DSIR log-ratio near a rounding midpoint"

    # (b) unigram: every round's lp inputs from the output's counts
    out = q.REGISTRY["unigram_train_pieces"].fn(spark, SF_DIR).toPandas()
    v = len(out)
    seed_tot = int(out.seed_cnt.sum())
    xs = [math.log(c / seed_tot) * UNI_LP_SCALE for c in out.seed_cnt]
    for col in ("cnt_r1", "cnt_r2"):
        ctot = int(out[col].sum())
        xs += [math.log((c + 1) / (ctot + v)) * UNI_LP_SCALE for c in out[col]]
    assert midpoint_margin(xs) > 1e-9, "unigram log-prob near a rounding midpoint"

    # (c) hybrid/TF-IDF IDF weights over the surviving vocabulary
    rows = con.execute("""
        WITH tf AS (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), w -> w <> '')) AS word
            FROM documents) GROUP BY 1, 2
        ),
        dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT df, n.n FROM dfreq, n
    """).fetchall()
    xs = [math.log(n / df) * 10000 for df, n in rows]
    assert midpoint_margin(xs) > 1e-9, "IDF weight near a rounding midpoint"


def test_hybrid_cosine_margins(spark):
    """ADVICE r06: the hybrid channels' 6-dp rounded cosines get the
    same midpoint pin as every ln-quantization site — a raw cosine
    within an ulp of a .5e-6 midpoint would flip a channel rank
    cross-engine (numpy normalize-then-matmul vs DuckDB
    list_cosine_similarity on the semantic side; bigint-norm sqrt
    division on the lexical side). Both channels' FULL query×corpus
    pair sets are recomputed here with the engines' exact arithmetic;
    measured margins on this fixture are ~2e-5..8e-5 in quantized
    (1e-6) units — five orders of magnitude above double-ulp scale."""
    import math

    import numpy as np

    import duckdb

    from minimapreduce_spark.operators.similarity import HY_NQ
    from tests.conftest import SF_DIR, table_path

    def margin_6dp(xs):
        xs = np.asarray(xs, dtype=np.float64) * 1e6
        return np.abs(np.mod(xs, 1.0) - 0.5).min()

    con = duckdb.connect()

    # SEMANTIC channel: float64 normalize-then-matmul — byte-for-byte
    # the _brute_sims_numpy arithmetic (query rows are vec_id < HY_NQ)
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"'{table_path(SF_DIR, 'embeddings')}' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    E = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    q = ids < HY_NQ
    sem = (En[~q] @ En[q].T).ravel()
    assert margin_6dp(sem) > 1e-9, "semantic cosine near a .5e-6 midpoint"

    # LEXICAL channel: exact BIGINT dots/norms (the ten-thousandths IDF
    # quantization), then the same sqrt-division Spark runs
    rows = con.execute(f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(text, '[^A-Za-z]+'), w -> w <> '')) AS word
          FROM '{table_path(SF_DIR, 'documents')}'
        ),
        tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n
              FROM '{table_path(SF_DIR, 'documents')}'),
        w AS (SELECT doc_id, word,
                     tf * CAST(round(ln(CAST(n.n AS DOUBLE) / df) * 10000)
                               AS BIGINT) AS w
              FROM tf JOIN dfreq USING (word), n
              WHERE df * 10 <= n.n * 9),
        norms AS (SELECT doc_id, sum(w * w) AS nsq FROM w GROUP BY 1),
        dots AS (SELECT q.doc_id AS qd, c.doc_id AS cd,
                        sum(q.w * c.w) AS dot
                 FROM w q JOIN w c USING (word)
                 WHERE q.doc_id < {HY_NQ} AND c.doc_id >= {HY_NQ}
                 GROUP BY 1, 2)
        SELECT dot, nq.nsq, nc.nsq FROM dots
        JOIN norms nq ON nq.doc_id = qd
        JOIN norms nc ON nc.doc_id = cd
    """).fetchall()
    lex = [dot / (math.sqrt(a) * math.sqrt(b)) for dot, a, b in rows]
    assert margin_6dp(lex) > 1e-9, "lexical cosine near a .5e-6 midpoint"


def test_ivfpq_nprobe_recall_monotone(spark):
    """The nprobe dial composed into the residual-PQ chain (round-6
    verdict item 5): at nprobe=2 each query's candidate set is a strict
    SUPERSET of nprobe=1's (same routing order, more cells), so

      - per query and per rank r, the r-th best ADC similarity at
        nprobe=2 >= the r-th best at nprobe=1 (the k-th order statistic
        over a superset can only improve; shared candidates score
        identically because the per-cell terms ride the route rows);
      - recall@5 vs the exact cosine top-5 is monotone:
        recall(nprobe=2) >= recall(nprobe=1) (measured 0.11 -> 0.19 on
        this fixture, where label cells carry no geometry — the doubled
        candidate pool nearly doubles end-to-end recall);
      - neighbors span AT MOST IVF_NPROBE cells per query, and no
        query finds itself."""
    from minimapreduce_spark.operators.similarity import (
        IVF_NPROBE,
        ann_cosine_topk,
        ann_ivfpq_nprobe_topk,
        ann_ivfpq_topk,
    )

    np1 = ann_ivfpq_topk(spark, SF_DIR).toPandas()
    np2 = ann_ivfpq_nprobe_topk(spark, SF_DIR).toPandas()
    assert (np2["q_vec_id"] != np2["neighbor_id"]).all(), "self-find"

    import pyarrow.parquet as pa

    lab = (
        pa.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "label"])
        .to_pandas()
        .set_index("vec_id")["label"]
    )
    cells2 = (
        np2.assign(nl=np2["neighbor_id"].map(lab)).groupby("q_vec_id")["nl"].agg(set)
    )
    assert (cells2.map(len) <= IVF_NPROBE).all(), "more cells than probes"
    s1 = np1.set_index(["q_vec_id", "rn"])["ivfpq_sim"]
    s2 = np2.set_index(["q_vec_id", "rn"])["ivfpq_sim"]
    for key, v1 in s1.items():
        assert s2[key] >= v1, f"rank-{key[1]} ADC sim regressed for q{key[0]}"

    def recall(got_df, truth_df):
        num = den = 0
        for qid, grp in truth_df.groupby("q_vec_id"):
            truth = set(grp["neighbor_id"])
            got = set(got_df[got_df["q_vec_id"] == qid]["neighbor_id"])
            num += len(truth & got)
            den += len(truth)
        assert den > 0
        return num / den

    bf = ann_cosine_topk(spark, SF_DIR).toPandas()
    truth = bf[bf["rn"] <= 5]
    r1, r2 = recall(np1, truth), recall(np2, truth)
    assert r2 >= r1, f"recall not monotone in nprobe: {r1:.3f} -> {r2:.3f}"


def test_bitext_margin_mining_replay_and_matching(spark):
    """Full numpy replay of the margin-mining algorithm (the
    test_ivfpq_exact_decomposition_replay discipline) plus the
    structural contracts:

      - output is a PARTIAL MATCHING: every src (even id) and tgt
        (odd id) appears at most once;
      - the mined set, cosines, margins and neighborhood sums equal an
        independent numpy implementation EXACTLY (same quantization,
        same tie-breaks);
      - midpoint margins: no raw parity cosine sits within 1e-9 of a
        .5 millionth midpoint, and no margin within 1e-9 of a .5e-6
        midpoint — the cross-engine flip guard, same pin as the hybrid
        channels'."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import BM_K, bitext_margin_mining

    out = bitext_margin_mining(spark, SF_DIR).toPandas()

    assert (out["src_vec_id"] % 2 == 0).all() and (out["tgt_vec_id"] % 2 == 1).all()
    assert out["src_vec_id"].is_unique and out["tgt_vec_id"].is_unique, (
        "mutual-best must yield a partial matching"
    )

    tbl = pa.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    E = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    a_mask = ids % 2 == 0
    a_ids, b_ids = ids[a_mask], ids[~a_mask]
    S = En[a_mask] @ En[~a_mask].T  # (|A|, |B|) raw cosines

    # midpoint pins (raw cosine in millionths)
    frac = np.abs(np.mod(S.ravel() * 1e6, 1.0) - 0.5)
    assert frac.min() > 1e-9, "parity cosine near a .5 millionth midpoint"

    def q_half_away(x):  # round half away from zero, the SQL round()
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    cos_u = q_half_away(S * 1e6)

    def topk_desc(row_vals, other_ids, k):
        # order: cos_u desc, id asc — argsort on (-cos_u, id)
        order = np.lexsort((other_ids, -row_vals))[:k]
        return order

    sum_x = {}
    cand = set()
    for i, aid in enumerate(a_ids):
        sel = topk_desc(cos_u[i], b_ids, BM_K)
        sum_x[aid] = int(cos_u[i][sel].sum())
        cand.update((aid, b_ids[j]) for j in sel)
    sum_y = {}
    for j, bid in enumerate(b_ids):
        sel = topk_desc(cos_u[:, j], a_ids, BM_K)
        sum_y[bid] = int(cos_u[:, j][sel].sum())
        cand.update((a_ids[i], bid) for i in sel)

    ai = {v: i for i, v in enumerate(a_ids)}
    bi = {v: i for i, v in enumerate(b_ids)}
    rows = []
    for aid, bid in cand:
        cu = int(cos_u[ai[aid], bi[bid]])
        marg_raw = cu * 2 * BM_K / (sum_x[aid] + sum_y[bid])
        f = abs((marg_raw * 1e6) % 1.0 - 0.5)
        assert f > 1e-9, "margin near a .5e-6 midpoint"
        marg = float(np.sign(marg_raw) * np.floor(np.abs(marg_raw) * 1e6 + 0.5) / 1e6)
        rows.append((aid, bid, cu, marg))
    best_a, best_b = {}, {}
    for aid, bid, cu, marg in rows:
        key = (-marg, -cu, bid)
        if aid not in best_a or key < best_a[aid][0]:
            best_a[aid] = (key, bid)
        key_b = (-marg, -cu, aid)
        if bid not in best_b or key_b < best_b[bid][0]:
            best_b[bid] = (key_b, aid)
    mined = {
        (aid, bid, cu, marg, sum_x[aid], sum_y[bid])
        for aid, bid, cu, marg in rows
        if best_a[aid][1] == bid and best_b[bid][1] == aid
    }
    got = {
        (int(r.src_vec_id), int(r.tgt_vec_id),
         int(round(r.cosine_sim * 1e6)), float(r.margin),
         int(r.sum_x), int(r.sum_y))
        for r in out.itertuples()
    }
    assert got == mined, (
        f"replay mismatch: {len(got)} vs {len(mined)}; "
        f"spark-only {sorted(got - mined)[:3]}, "
        f"numpy-only {sorted(mined - got)[:3]}"
    )


def test_audio_spectral_planted_tone_and_centroid_midpoints(spark, tmp_path):
    """The spectral lane's physics check: a planted PERIOD-4 square
    wave (samples cycling HHLL) concentrates its AC power at bin
    k = N/4 = 4, so every window of the planted doc must report
    dominant_bin == 4 — through the REAL encode→wave-decode→DFT chain,
    not a shortcut on the text. Also pins the exactness contract on
    the real fixture: no window's centroid expression sits within 1e-9
    of a .5 milli-bin midpoint (the cross-engine rounding flip guard),
    and re/im recompute exactly in numpy from the shared twiddle
    tables."""
    import numpy as np
    import pandas as pd

    from minimapreduce_spark.operators.multimodal import (
        DFT_N,
        dft_twiddles,
        multimodal_audio_spectral,
    )

    # planted tone: 'zzaa' repeated — period 4 → bin 16/4 = 4
    tone = "zzaa" * 32  # 128 samples = 8 full windows
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([0], dtype=np.int64),
            "text": [tone],
            "source": ["planted"],
        }
    )
    d = tmp_path / "tone_corpus"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"), index=False)
    out = multimodal_audio_spectral(spark, str(d)).toPandas()
    assert len(out) == len(tone) // DFT_N
    assert (out["dominant_bin"] == DFT_N // 4).all(), out["dominant_bin"].tolist()

    # real-fixture exactness pins
    real = multimodal_audio_spectral(spark, SF_DIR).toPandas()
    assert len(real) > 0
    # centroid midpoint guard: recompute kp/tp from dominant/total is
    # not enough — rebuild the full spectrum for a sample of windows
    import duckdb

    C, S = dft_twiddles()
    Wc = np.array(C[1:], dtype=np.int64)
    Ws = np.array(S[1:], dtype=np.int64)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' LIMIT 25"
    ).df()
    ks = np.arange(1, DFT_N // 2 + 1, dtype=np.int64)
    checked = 0
    for r in docs.itertuples():
        arr = np.frombuffer(r.text.encode(), dtype=np.uint8).astype(np.int64)
        n_win = len(arr) // DFT_N
        if n_win == 0:
            continue
        X = arr[: n_win * DFT_N].reshape(n_win, DFT_N)
        p = (X @ Wc.T) ** 2 + (X @ Ws.T) ** 2
        kp = (p * ks).sum(axis=1)
        tp = p.sum(axis=1)
        c_raw = kp.astype(np.float64) * 1000 / tp.astype(np.float64)
        frac = np.abs(np.mod(c_raw, 1.0) - 0.5)
        assert frac.min() > 1e-9, "centroid near a .5 milli-bin midpoint"
        sub = real[real.doc_id == r.doc_id].sort_values("window_id")
        assert (sub["total_power"].to_numpy() == tp).all()
        dom = p.argmax(axis=1)  # numpy first-occurrence == (p desc, k asc)
        assert (sub["dominant_bin"].to_numpy() == ks[dom]).all()
        checked += n_win
    assert checked > 100
    con.close()


def test_bitext_ivf_score_stage_equals_brute_on_in_cell_pairs(spark):
    """The IVF-routed bitext twin's whole claim: the SCORER changes
    (same-cell equi-join + codegen cosine fold vs driver-broadcast
    numpy matmul), the scores do not. Pins:

      - the routed candidate frame is EXACTLY the per-side top-BM_K
        union over same-cell pairs (cells from an independent numpy
        replay of the centroid routing), with bit-identical cos_u —
        the in-kernel HALF_UP quantization and (cos_u DESC, id ASC)
        reduction agree with the replay pair for pair;
      - every cell holds vectors of both parities or contributes no
        pairs (no phantom cells);
      - the mined output is still a partial matching on both sides."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        _bitext_ivf_pairs,
        _emb,
        bitext_margin_mining_ivf,
    )

    emb = _emb(spark, SF_DIR)
    got_pairs = {
        (int(r.a_id), int(r.b_id)): int(r.cos_u)
        for r in _bitext_ivf_pairs(emb).collect()
    }

    tbl = pa.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(tbl["vec_id"])
    labels = np.asarray(tbl["label"])
    E = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    # centroid routing replay: per-label means, assign by rounded
    # cosine desc then label asc — the _ivf_cell_sims text
    uniq = np.unique(labels)
    C = np.stack([E[labels == lab].mean(axis=0) for lab in uniq])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    sims = np.round(En @ Cn.T, 6)  # numpy half-even, but ties pinned below
    order = np.lexsort((uniq[None, :].repeat(len(ids), 0), -sims), axis=-1)
    cell = uniq[order[:, 0]]
    frac = np.abs(np.mod((En @ Cn.T).ravel() * 1e6, 1.0) - 0.5)
    assert frac.min() > 1e-9, "routing cosine near a .5 millionth midpoint"

    a_mask, b_mask = ids % 2 == 0, ids % 2 == 1
    S = En[a_mask] @ En[b_mask].T
    cos_u = (np.sign(S) * np.floor(np.abs(S * 1e6) + 0.5)).astype(np.int64)
    a_ids_, b_ids_ = ids[a_mask], ids[b_mask]
    in_cell = {
        (int(ai), int(bi)): int(cos_u[i, j])
        for i, ai in enumerate(a_ids_)
        for j, bi in enumerate(b_ids_)
        if cell[a_mask][i] == cell[b_mask][j]
    }
    # candidate-union replay: per endpoint, its within-cell top-BM_K
    # by (cos_u DESC, id ASC) — the kernel's in-worker reduction
    from minimapreduce_spark.operators.similarity import BM_K

    by_a: dict = {}
    by_b: dict = {}
    for (ai, bi), cu in in_cell.items():
        by_a.setdefault(ai, []).append((-cu, bi))
        by_b.setdefault(bi, []).append((-cu, ai))
    want_pairs = {}
    for ai, lst in by_a.items():
        for negcu, bi in sorted(lst)[:BM_K]:
            want_pairs[(ai, bi)] = -negcu
    for bi, lst in by_b.items():
        for negcu, ai in sorted(lst)[:BM_K]:
            want_pairs[(ai, bi)] = -negcu
    assert got_pairs == want_pairs, (
        f"candidate union diverged: {len(got_pairs)} vs {len(want_pairs)} pairs"
    )

    out = bitext_margin_mining_ivf(spark, SF_DIR).toPandas()
    assert (out["src_vec_id"] % 2 == 0).all() and (out["tgt_vec_id"] % 2 == 1).all()
    assert out["src_vec_id"].is_unique and out["tgt_vec_id"].is_unique
    # every mined pair is an in-cell pair
    mined = {(int(r.src_vec_id), int(r.tgt_vec_id)) for r in out.itertuples()}
    assert mined <= set(want_pairs)


def test_source_influence_loo_equals_physical_retrain(spark):
    """The LOO shortcut's whole claim: moment subtraction ≡ physical
    retrain. For three sources, WRITE a corpus with that source's rows
    actually removed, retrain the probe on it from scratch (the
    registered quality_linear_probe plan), score the FULL corpus with
    those weights, and the accuracy must equal the registered query's
    acc_loo EXACTLY (BIGINT subset moments ≡ total − source; same
    Cramer expression text ⇒ bit-identical weights ⇒ identical keep
    decisions — no tolerance needed). Also pins the output identities
    influence = round(acc_full − acc_loo, 6) and Σ n_docs = corpus."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import TABLES, table_path
    from minimapreduce_spark.operators.pipeline import (
        _PROBE_SCORE,
        quality_linear_probe,
    )

    out = q.queries()["source_influence_loo"](spark, SF_DIR).toPandas()
    full_probe = quality_linear_probe(spark, SF_DIR).toPandas()
    acc_full_raw = float((full_probe["keep"] == full_probe["y"]).mean())
    assert (out["acc_full"] == round(acc_full_raw, 6)).all()
    n_corpus = len(full_probe)
    assert int(out["n_docs"].sum()) == n_corpus

    docs = spark.read.parquet(table_path(SF_DIR, "documents"))
    tmp = tempfile.mkdtemp(prefix="loo_retrain_")
    try:
        for src in sorted(out["source"])[:3]:
            d = os.path.join(tmp, src)
            os.makedirs(d)
            for t in TABLES:
                if t == "documents":
                    docs.where(F.col("source") != src).write.parquet(
                        os.path.join(d, "documents.parquet")
                    )
                else:
                    os.symlink(
                        table_path(SF_DIR, t), os.path.join(d, f"{t}.parquet")
                    )
            # retrain on the reduced corpus, keep ONLY the weights...
            # which live inside the probe plan — so score the reduced
            # corpus, then re-derive the full-corpus accuracy by
            # scoring the full corpus with the same weights: easiest
            # exact route is to re-run the probe on the reduced corpus
            # and join its weights-applied scores back. The probe
            # scores only its own training rows, so instead rebuild
            # the weights frame exactly as the probe does and apply to
            # the full corpus.
            from minimapreduce_spark.operators.pipeline import (
                PROBE_GRID,
                PROBE_QUALITY_CUT,
                _probe_solve_exprs,
            )
            from minimapreduce_spark.operators.text_analysis import EN_STOP
            from minimapreduce_spark.catalog import load_table

            def feats_of(sf_dir):
                dd = load_table(spark, sf_dir, "documents")
                ws = F.filter(F.split(F.col("text"), r"[^A-Za-z]+"), lambda w: w != "")
                stop_arr = F.array(*[F.lit(s) for s in EN_STOP])
                n_tokens = F.size(ws)
                n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
                n_distinct = F.size(F.array_distinct(ws))
                stop_ratio = n_stop * F.lit(1.0) / n_tokens
                quality = (
                    0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
                    + 0.3 * (1.0 - stop_ratio)
                    + 0.2 * (n_distinct * F.lit(1.0) / n_tokens)
                )
                return (
                    dd.select(
                        "doc_id",
                        F.when(quality >= float(PROBE_QUALITY_CUT), 1)
                        .otherwise(0)
                        .alias("y"),
                        F.lit(1.0).alias("x0"),
                        (F.least(n_tokens, F.lit(200)) / F.lit(200.0)).alias("x1"),
                        stop_ratio.alias("x2"),
                        (n_distinct * F.lit(1.0) / n_tokens).alias("x3"),
                        n_tokens.alias("_nt"),
                    )
                    .where(F.col("_nt") > 0)
                    .drop("_nt")
                )

            grid = float(PROBE_GRID)
            moms = [
                F.sum(
                    F.round(F.col(f"x{i}") * F.col(f"x{j}") * grid).cast("bigint")
                ).alias(f"s{i}{j}")
                for i in range(4)
                for j in range(i, 4)
            ] + [
                F.sum(
                    F.round(F.col(f"x{i}") * F.col("y") * grid).cast("bigint")
                ).alias(f"t{i}")
                for i in range(4)
            ] + [F.count(F.lit(1)).alias("n")]
            a_exprs, w_exprs = _probe_solve_exprs()
            wts = (
                feats_of(d).agg(*moms).selectExpr(*a_exprs, "n").selectExpr(*w_exprs)
            )
            rescored = (
                feats_of(SF_DIR)
                .crossJoin(F.broadcast(wts))
                .selectExpr(
                    "y",
                    f"CASE WHEN {_PROBE_SCORE} >= 0.5 THEN 1 ELSE 0 END AS k",
                )
                .toPandas()
            )
            acc_retrain = float((rescored["k"] == rescored["y"]).mean())
            row = out[out["source"] == src].iloc[0]
            assert round(acc_retrain, 6) == row.acc_loo, (
                src, acc_retrain, row.acc_loo
            )
            assert row.influence == round(acc_full_raw - acc_retrain, 6), src
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_hard_negative_mining_semantics(spark):
    """Hard-negative mining contracts: exactly HN_K rows per (query,
    kind); kinds agree with the label table; no self-candidates; and a
    numpy replay confirms the negatives really are the HARDEST — the
    top-HN_K different-label vectors by rounded cosine with vec_id
    tie-break (same for positives)."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        HN_K,
        N_QUERIES,
        ann_hard_negative_mining,
    )

    out = ann_hard_negative_mining(spark, SF_DIR).toPandas()
    counts = out.groupby(["q_vec_id", "kind"]).size()
    assert (counts == HN_K).all()
    assert out.groupby("q_vec_id").ngroups == N_QUERIES
    assert (out["q_vec_id"] != out["cand_id"]).all()

    tbl = pa.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"])
    labels = dict(zip(ids.tolist(), np.asarray(tbl["label"]).tolist()))
    E = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    idx = {v: i for i, v in enumerate(ids.tolist())}

    for qid, grp in out.groupby("q_vec_id"):
        ql = labels[qid]
        for r in grp.itertuples():
            want = "pos" if labels[r.cand_id] == ql else "neg"
            assert r.kind == want, (qid, r.cand_id)
        sims = En @ En[idx[qid]]
        cos6 = np.round(sims * 1e6) / 1e6
        for kind in ("pos", "neg"):
            mask = np.array(
                [
                    v != qid and (labels[v] == ql) == (kind == "pos")
                    for v in ids.tolist()
                ]
            )
            order = np.lexsort((ids[mask], -cos6[mask]))[:HN_K]
            want_ids = ids[mask][order].tolist()
            got = grp[grp["kind"] == kind].sort_values("rn")["cand_id"].tolist()
            assert got == want_ids, (qid, kind, got, want_ids)


def test_dim_truncation_recall_invariants(spark):
    """Matryoshka frontier contracts: one row per dim; the full-dim row
    is recall 1.0 BY CONSTRUCTION (truth vs itself); recall is the
    printed hits/(Q*K) exactly; hits are bounded by Q*K; and the
    frontier is weakly better at full dim than at the shortest prefix
    (the only ordering the isotropic fixture guarantees)."""
    from minimapreduce_spark.operators.similarity import (
        IVF_TOP_K,
        MRL_DIMS,
        N_QUERIES,
        ann_dim_truncation_recall,
    )

    out = (
        ann_dim_truncation_recall(spark, SF_DIR)
        .toPandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    assert list(out["dim"]) == sorted(MRL_DIMS)
    full = out[out["dim"] == 64].iloc[0]
    assert full.hits == N_QUERIES * IVF_TOP_K and full.recall == 1.0
    assert (out["hits"] <= N_QUERIES * IVF_TOP_K).all()
    for r in out.itertuples():
        assert r.recall == round(r.hits / (N_QUERIES * IVF_TOP_K), 6)
    assert full.recall >= out.iloc[0].recall


def test_bitext_nprobe_candidate_union_replays_and_matching(spark):
    """The multi-probe dial's structural pins: (a) the nprobe=2
    candidate frame replays EXACTLY in numpy — route every vector to
    its top-2 centroids (rounded-cosine DESC, label ASC), form each
    cell's replicated membership, take each endpoint's per-cell
    top-BM_K, union, dedupe; (b) the frame is NOT merely the nprobe=1
    set (the dial genuinely engages — and per-cell membership growth
    means it can both add AND rotate candidates, which is why the pin
    is a full replay, not a superset claim); (c) the mined output is
    still a partial matching."""
    import numpy as np
    import pyarrow.parquet as pa

    from minimapreduce_spark.operators.similarity import (
        BM_K,
        IVF_NPROBE,
        _bitext_ivf_pairs,
        _emb,
        bitext_margin_mining_ivf_nprobe,
    )

    emb = _emb(spark, SF_DIR)
    p1 = {
        (int(r.a_id), int(r.b_id)): int(r.cos_u)
        for r in _bitext_ivf_pairs(emb, 1).collect()
    }
    p2 = {
        (int(r.a_id), int(r.b_id)): int(r.cos_u)
        for r in _bitext_ivf_pairs(emb, IVF_NPROBE).collect()
    }
    assert p2 != p1  # the dial engages on the fixture

    tbl = pa.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(tbl["vec_id"])
    labels = np.asarray(tbl["label"])
    E = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    uniq = np.unique(labels)
    C = np.stack([E[labels == lab].mean(axis=0) for lab in uniq])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    order = np.lexsort((uniq[None, :].repeat(len(ids), 0),
                        -np.round(En @ Cn.T, 6)), axis=-1)
    cells = uniq[order[:, :IVF_NPROBE]]  # (n, nprobe) routed cells

    def q_half_away(x):
        return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(np.int64)

    want = {}
    for cell in uniq:
        am = (ids % 2 == 0) & (cells == cell).any(axis=1)
        bm = (ids % 2 == 1) & (cells == cell).any(axis=1)
        if not am.any() or not bm.any():
            continue
        a_ids, b_ids = ids[am], ids[bm]
        cu = q_half_away(En[am] @ En[bm].T)
        for i in range(len(a_ids)):
            sel = np.lexsort((b_ids, -cu[i]))[:BM_K]
            for j in sel:
                want[(int(a_ids[i]), int(b_ids[j]))] = int(cu[i, j])
        for j in range(len(b_ids)):
            sel = np.lexsort((a_ids, -cu[:, j]))[:BM_K]
            for i in sel:
                want[(int(a_ids[i]), int(b_ids[j]))] = int(cu[i, j])
    assert p2 == want, (len(p2), len(want))

    out = bitext_margin_mining_ivf_nprobe(spark, SF_DIR).toPandas()
    assert out["src_vec_id"].is_unique and out["tgt_vec_id"].is_unique


def test_bq_hamming_rescore_properties(spark, tmp_path):
    """The binary-quantization rung's contracts:

    (a) recall@10 vs exact cosine — measured floor on the real fixture
        (sign bits on a near-isotropic corpus are the documented worst
        case; chance at k=10 of ~2000 is ~0.005, the floor pins well
        above it);
    (b) rescore dominance: per query, the exact-cosine sum of the
        rescored top-K is ≥ that of the top-K by raw hamming alone
        (the rescore can only improve the final ranking);
    (c) planted clusters: on a corpus of 10 well-separated random
        clusters, BQ + rescore returns same-cluster neighbors with
        precision 1.0 — where sign bits DO carry structure, the chain
        recovers it."""
    import os

    import numpy as np
    import pandas as pd

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.similarity import BQ_CAND, TOP_K

    out = q.queries()["ann_bq_hamming_topk"](spark, SF_DIR).toPandas()
    exact = q.queries()["ann_cosine_topk"](spark, SF_DIR).toPandas()
    num = den = 0
    for qid, g in exact.groupby("q_vec_id"):
        truth = set(g.neighbor_id)
        got = set(out[out.q_vec_id == qid].neighbor_id)
        num += len(truth & got)
        den += len(truth)
    recall = num / den
    assert recall > 0.05, f"BQ recall collapsed: {recall}"  # chance ≈ 0.005

    # (b) rescore dominance, replayed in numpy from the raw fixture
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    E = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sig = (E > 0).astype(np.int64)
    idx = {v: i for i, v in enumerate(ids)}
    for qid, g in out.groupby("q_vec_id"):
        qi = idx[qid]
        ham = (sig != sig[qi]).sum(axis=1)
        ham[qi] = 10**9
        order = np.lexsort((ids, ham))
        cand = order[:BQ_CAND]
        cos = En[cand] @ En[qi]
        # raw-hamming top-K vs rescored top-K
        raw_top = cand[:TOP_K]
        resc = g.sort_values("rn").neighbor_id.to_numpy()
        raw_sum = (En[raw_top] @ En[qi]).sum()
        resc_sum = (En[[idx[v] for v in resc]] @ En[qi]).sum()
        assert resc_sum >= raw_sum - 1e-12, (qid, resc_sum, raw_sum)
        # engine candidates must be the numpy candidate set's rescore
        assert set(resc) <= {ids[c] for c in cand}, qid

    # (c) planted clusters
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (10, 64))
    rows = []
    for c in range(10):
        for j in range(30):
            v = centers[c] + rng.normal(0, 0.05, 64)
            rows.append((c * 30 + j, list(map(float, v)), int(c)))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    d = str(tmp_path / "bq_plant")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
    res = q.queries()["ann_bq_hamming_topk"](spark, d).toPandas()
    assert len(res) > 0
    assert ((res.q_vec_id // 30) == (res.neighbor_id // 30)).all(), (
        "BQ returned a cross-cluster neighbor on separated clusters"
    )


def test_star_components_path_and_twin_equality(spark):
    """The large-star/small-star kernel's contracts: (a) a planted
    256-vertex PATH (diameter 255 — past min-label's 50-round guard)
    converges in ≤ 12 star rounds to one component rooted at 0;
    (b) on a random 150-vertex multigraph the star labels equal
    min-label propagation's EXACTLY; (c) the registered
    `graph_components_star` equals `dedup_clusters` frame-for-frame
    (shared pipeline, different kernel)."""
    import random

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import (
        min_label_components,
        star_components,
    )
    from tests.conftest import SF_DIR

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "doc_a bigint, doc_b bigint"
    )
    out = star_components(pairs).collect()
    assert star_components.last_rounds <= 12
    assert len(out) == 256 and all(r.cluster_id == 0 for r in out)
    assert sum(r.is_canonical for r in out) == 1

    random.seed(3)
    edges = [(random.randrange(150), random.randrange(150)) for _ in range(120)]
    p2 = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "doc_a bigint, doc_b bigint"
    )
    s = {tuple(r) for r in star_components(p2).collect()}
    m = {tuple(r) for r in min_label_components(p2).collect()}
    assert s == m

    a = {tuple(r) for r in q.queries()["graph_components_star"](spark, SF_DIR).collect()}
    b = {tuple(r) for r in q.queries()["dedup_clusters"](spark, SF_DIR).collect()}
    assert a == b


def test_adaptive_components_dispatches_by_graph_shape(spark):
    """The adaptive kernel's dispatch contract (the round-9 verdict
    stretch): (a) on the planted 256-vertex PATH the probe does NOT
    converge, the graph contracts by the probe labels, and the STAR
    kernel finishes — one component rooted at 0, kernel == "star";
    (b) on a near-CLIQUE the probe converges and min-label's own
    labels are returned — kernel == "min-label", zero star rounds
    paid; (c) on a random multigraph the adaptive labels equal
    min-label's exactly (whichever way it dispatched); (d) the
    registered `dedup_clusters_adaptive` equals `dedup_clusters`
    frame-for-frame AND resolves the fixture's near-clique Jaccard
    graph inside the probe — the faster kernel on that regime."""
    import random

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import (
        adaptive_components,
        min_label_components,
    )
    from tests.conftest import SF_DIR

    # (a) chainy → star
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "doc_a bigint, doc_b bigint"
    )
    out = adaptive_components(path).collect()
    assert adaptive_components.last_kernel == "star"
    assert len(out) == 256 and all(r.cluster_id == 0 for r in out)
    assert sum(r.is_canonical for r in out) == 1

    # (b) near-clique → min-label inside the probe
    clique = spark.createDataFrame(
        [(i, j) for i in range(12) for j in range(i + 1, 12)]
        + [(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)],
        "doc_a bigint, doc_b bigint",
    )
    out = {tuple(r) for r in adaptive_components(clique).collect()}
    assert adaptive_components.last_kernel == "min-label"
    assert out == {tuple(r) for r in min_label_components(clique).collect()}

    # (c) random graph: equality either way
    random.seed(7)
    edges = [(random.randrange(150), random.randrange(150)) for _ in range(120)]
    p2 = spark.createDataFrame(
        [(x, y) for x, y in edges if x != y], "doc_a bigint, doc_b bigint"
    )
    s = {tuple(r) for r in adaptive_components(p2).collect()}
    m = {tuple(r) for r in min_label_components(p2).collect()}
    assert s == m

    # (d) registered twin equality + fixture dispatch
    a = {
        tuple(r)
        for r in q.queries()["dedup_clusters_adaptive"](spark, SF_DIR).collect()
    }
    b = {tuple(r) for r in q.queries()["dedup_clusters"](spark, SF_DIR).collect()}
    assert a == b
    assert adaptive_components.last_kernel == "min-label"


def test_minhash_index_probe_all_batch_corpus_and_root_keying(spark, tmp_path):
    """Round-9 review findings, pinned: (a) a corpus whose EVERY doc is
    in the arrival batch (all doc_id % INCR_BATCH_MOD == 0) publishes a
    zero-row corpus index — the probe must return the batch-internal
    near-dup pairs (explicit artifact-read schemas; previously an
    'Unable to infer schema' crash); (b) the artifact root is keyed by
    batch_mod, so two different corpus splits can never share (and
    silently poison) one persisted index."""
    import os

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.dedup import minhash_index_root

    rows = [
        (
            i * 10,
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            + ("varianta" if i % 2 else "variantb"),
            "en",
            "s",
            60,
        )
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path / "allbatch")
    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    out = q.queries()["dedup_minhash_index_probe"](spark, d).toPandas()
    # two byte-identical groups of 5 → C(5,2)·2 = 20 jaccard-1.0 pairs
    assert len(out) == 20 and (out.jaccard == 1.0).all()

    assert minhash_index_root(d, batch_mod=10) != minhash_index_root(
        d, batch_mod=5
    )

#!/usr/bin/env python
"""Batch-cost-independence probe for ``dedup_minhash_incremental``.

THE incremental-dedup scale claim is that pairwise work is driven by
the day's arrival batch, never the corpus: candidates come from
``batch_buckets ⋈ all_buckets``, the corpus side never self-joins. The
pytest pins this on a toy shingle-disjoint corpus; this probe measures
it at bench scale:

- corpus_m = sf0.1 documents × m variants (the scale_experiment
  word-prefix trick: every word gets a letters-only per-variant prefix,
  so variants are shingle-disjoint from the base and each other while
  each variant carries the base corpus's natural overlap structure);
- batch    = a FIXED 500-doc arrival slice (exact copies of base docs
  0-499 under fresh ids), identical at every multiplier;
- measured per m ∈ (1, 4, 16): index-build wall (shingle → signature →
  band buckets, the corpus-linear map pass a production deployment
  PERSISTS and amortizes), probe wall (batch semi-join → band join →
  candidate dedup → exact-Jaccard verify), candidate count, verified
  pair count.

Expected: candidates and verified pairs EXACTLY constant across m
(batch docs collide only with their identity-variant sources plus the
base corpus's fixed natural near-dups — the added variants are
shingle-disjoint by construction); probe wall ~flat; index wall ~linear
in m. Prints one JSON line per multiplier.

Round 9 added the SERVED phase (the `dedup_minhash_index_probe`
deployment shape): the corpus-side buckets/shingles are PERSISTED as
the `minhash_index_build` artifact layout (buckets partitioned by
band + distinct shingles, parquet), and a second probe is timed
reading the corpus side from the artifact alone — batch shingled/
signed/banded fresh, candidates from batch ⋈ (artifact ∪ batch),
verify against artifact shingles ∪ batch shingles. Expected: served
candidates/pairs identical to the inline probe's, served wall ~flat
across m (the artifact scan is band-partition-pruned and the join is
batch-driven).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
BATCH_N = 500
BATCH_ID0 = 900_000_000
MULTS = (1, 4, 16)


def main() -> None:
    import pyspark.sql.functions as F

    from minimapreduce_spark.catalog import fan_out, load_table
    from minimapreduce_spark.operators.dedup import (
        MINHASH_THRESHOLD,
        jaccard_pairs,
        minhash_band_buckets,
        minhash_signatures,
        shingle_hashes,
    )
    from minimapreduce_spark.session import get_spark

    spark = get_spark(app_name="incremental-probe")
    base = load_table(spark, BASE, "documents").select("doc_id", "text")
    base.count()  # warm

    batch = (
        base.where(F.col("doc_id") < BATCH_N)
        .select((F.col("doc_id") + BATCH_ID0).alias("doc_id"), "text")
    )

    for m in MULTS:
        variants = [base]
        for v in range(1, m):
            pre = "v" + chr(ord("a") + v)
            # letters-only per-variant word prefix (scale_experiment
            # discipline): shifts every shingle, variants stay disjoint
            words = F.split("text", " ")
            pref = F.concat_ws(
                " ", F.transform(words, lambda w: F.concat(F.lit(pre), w))
            )
            variants.append(
                base.select(
                    (F.col("doc_id") + v * 10_000_000).alias("doc_id"),
                    pref.alias("text"),
                )
            )
        corpus = variants[0]
        for df in variants[1:]:
            corpus = corpus.unionByName(df)
        docs = corpus.unionByName(batch)
        is_batch = F.col("doc_id") >= BATCH_ID0

        # index build (the persisted/amortized side in production)
        t0 = time.perf_counter()
        fanned = fan_out(spark, docs)
        sh = shingle_hashes(spark, BASE, distinct=False, docs=fanned).localCheckpoint()
        sigs = minhash_signatures(spark, BASE, shingles=sh).localCheckpoint()
        buckets = minhash_band_buckets(sigs).localCheckpoint()
        n_docs = sigs.count()
        t_index = time.perf_counter() - t0

        # batch probe: semi-join → band join → candidates → verify
        t1 = time.perf_counter()
        batch_ids = docs.where(is_batch).select("doc_id")
        batch_buckets = buckets.join(batch_ids, "doc_id", "left_semi")
        candidates = (
            batch_buckets.select(F.col("doc_id").alias("ba"), "band", "bh")
            .join(
                buckets.select(F.col("doc_id").alias("other"), "band", "bh"),
                ["band", "bh"],
            )
            .where(F.col("ba") != F.col("other"))
            .select(
                F.least("ba", "other").alias("doc_a"),
                F.greatest("ba", "other").alias("doc_b"),
            )
            .distinct()
            .localCheckpoint()
        )
        n_cand = candidates.count()
        t_cand = time.perf_counter() - t1

        t2 = time.perf_counter()
        pairs = jaccard_pairs(
            spark,
            BASE,
            MINHASH_THRESHOLD,
            candidates=candidates,
            shingles=sh.distinct(),
        )
        n_pairs = pairs.count()
        t_verify = time.perf_counter() - t2

        # SERVED phase: persist the corpus side in the
        # minhash_index_build artifact layout, then probe from disk
        import shutil
        import tempfile

        art = tempfile.mkdtemp(prefix=f"mh_idx_probe_m{m}_")
        corpus_docs_only = docs.where(~is_batch).select("doc_id")
        t3 = time.perf_counter()
        (
            buckets.join(corpus_docs_only, "doc_id", "left_semi")
            .repartition("band")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(os.path.join(art, "buckets"))
        )
        (
            sh.distinct()
            .join(corpus_docs_only, "doc_id", "left_semi")
            .write.mode("overwrite")
            .parquet(os.path.join(art, "shingles"))
        )
        t_persist = time.perf_counter() - t3

        t4 = time.perf_counter()
        from minimapreduce_spark.operators.dedup import (
            MINHASH_BUCKET_SCHEMA,
            MINHASH_SHINGLE_SCHEMA,
            probe_band_index,
        )

        idx_buckets = (
            spark.read.schema(MINHASH_BUCKET_SCHEMA)
            .parquet(os.path.join(art, "buckets"))
            .select("doc_id", F.col("band").cast("int").alias("band"), "bh")
        )
        idx_sh = spark.read.schema(MINHASH_SHINGLE_SCHEMA).parquet(
            os.path.join(art, "shingles")
        )
        batch_docs = docs.where(is_batch)
        base_b = shingle_hashes(
            spark, BASE, distinct=False, docs=fan_out(spark, batch_docs)
        ).localCheckpoint()
        buckets_b = minhash_band_buckets(
            minhash_signatures(spark, BASE, shingles=base_b)
        ).localCheckpoint()
        pairs_srv = probe_band_index(
            spark,
            BASE,
            batch_buckets=buckets_b,
            batch_shingles=base_b.distinct(),
            index_buckets=idx_buckets,
            index_shingles=idx_sh,
        )
        n_pairs_srv = pairs_srv.count()
        t_served = time.perf_counter() - t4

        # APPEND phase (round 10): merge the fixed batch INTO the
        # persisted artifact (minhash_index_append: batch-only compute
        # + hardlink fold-in + atomic re-publish). Expected: append
        # wall ~flat across m — the batch pipeline is fixed and the
        # base fold-in is O(#files) metadata ops, never data bytes.
        from minimapreduce_spark.operators.dedup import minhash_index_append

        t5 = time.perf_counter()
        app_root = minhash_index_append(
            spark,
            BASE,
            batch_docs.select("doc_id", "text"),
            art,
            root=art + "_appended",
        )
        t_append = time.perf_counter() - t5
        n_linked = sum(
            1
            for sub in ("buckets", "shingles")
            for _, _, files in os.walk(os.path.join(app_root, sub))
            for f in files
            if f.startswith("base-")
        )
        shutil.rmtree(art, ignore_errors=True)
        shutil.rmtree(app_root, ignore_errors=True)

        print(
            json.dumps(
                {
                    "mult": m,
                    "corpus_docs": n_docs,
                    "index_build_sec": round(t_index, 2),
                    "probe_candidates_sec": round(t_cand, 2),
                    "probe_verify_sec": round(t_verify, 2),
                    "candidates": n_cand,
                    "verified_pairs": n_pairs,
                    "artifact_persist_sec": round(t_persist, 2),
                    "served_probe_sec": round(t_served, 2),
                    "served_pairs": n_pairs_srv,
                    "append_sec": round(t_append, 2),
                    "append_linked_files": n_linked,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

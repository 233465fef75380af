#!/usr/bin/env python
"""Batch-cost-independence probe for the IVF-PQ APPEND rung.

THE incremental-index claim (`ann_ivfpq_append_serve` /
`_ivfpq_encode`): appending a batch to a persisted index costs one
narrow encode pass over the BATCH — residuals against broadcast
centroids, `_pq_assign` against the broadcast codebook, the bounded
vmap join — and is therefore independent of how large the indexed
corpus already is. The `incremental_scale_probe` methodology applied
to vectors:

- corpus_m = sf0.1 embeddings × m dim-roll variants (far apart in
  cosine, the scale_experiment trick), m ∈ (1, 4, 16);
- batch    = a FIXED 500-vector arrival slice (base vectors 0-499
  under fresh ids, +0.001 jitter on dim 0 so they are new rows),
  identical at every multiplier;
- measured per m: index TRAIN wall (centroids + codebooks — the
  corpus-linear pass a deployment persists and amortizes), batch
  ENCODE wall (the append), and the encoded-row count.

Expected: encode wall ~flat across m (its plan touches batch rows +
two bounded broadcasts only); train wall grows with m. Prints one
JSON line per multiplier.
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

    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.similarity import (
        KMEANS_SCALE,
        PQ_SUB,
        PQ_M,
        _ivfpq_encode,
        _pq_train,
    )
    from minimapreduce_spark.session import get_spark

    spark = get_spark(app_name="append-probe")
    base = load_table(spark, BASE, "embeddings")
    n_base = base.count()  # warm

    def quantize(df):
        return df.select(
            "vec_id",
            "label",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * KMEANS_SCALE).cast("bigint"),
            ).alias("eq"),
        )

    def rsub_of(embq, cg):
        res = embq.join(F.broadcast(cg), "label").select(
            "vec_id", "label",
            F.zip_with("eq", "cg", lambda x, y: x - y).alias("rq"),
        )
        ms = spark.range(PQ_M).select(F.col("id").cast("bigint").alias("m"))
        return res.crossJoin(F.broadcast(ms)).select(
            "vec_id", "label", "m",
            F.expr(f"slice(rq, m * {PQ_SUB} + 1, {PQ_SUB})").alias("sq"),
        )

    batch = quantize(
        base.where(F.col("vec_id") < BATCH_N).select(
            (F.col("vec_id") + BATCH_ID0).alias("vec_id"),
            "label",
            F.transform(
                "embedding",
                lambda x: x + F.lit(0.001).cast("float"),
            ).alias("embedding"),
        )
    ).localCheckpoint(eager=True)

    for m in MULTS:
        variants = [
            base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                "label",
                F.expr(
                    f"concat(slice(embedding, {i % 63 + 1}, 64), "
                    f"slice(embedding, 1, {i % 63}))"
                ).alias("embedding"),
            )
            for i in range(m)
        ]
        corpus = variants[0]
        for v in variants[1:]:
            corpus = corpus.unionByName(v)
        embq = quantize(corpus).localCheckpoint(eager=True)
        n_corpus = embq.count()

        t0 = time.perf_counter()
        cg = (
            embq.select("label", F.posexplode("eq").alias("pos", "v"))
            .groupBy("label", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "label", "pos",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("bigint").alias("mu"),
            )
            .groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda x: x["mu"],
                ).alias("cg")
            )
            .localCheckpoint(eager=True)
        )
        rsub_corpus = rsub_of(embq, cg)
        cb = _pq_train(spark, BASE, rsub_corpus.drop("label")).localCheckpoint(
            eager=True
        )
        cb.count()
        t_train = time.perf_counter() - t0

        t0 = time.perf_counter()
        enc = _ivfpq_encode(spark, rsub_of(batch, cg), cg, cb)
        n_enc = enc.count()
        t_append = time.perf_counter() - t0
        print(json.dumps({
            "mult": m,
            "corpus_rows": n_corpus,
            "train_sec": round(t_train, 2),
            "batch_rows": BATCH_N,
            "append_encode_sec": round(t_append, 2),
            "encoded_rows": n_enc,
        }), flush=True)


if __name__ == "__main__":
    main()

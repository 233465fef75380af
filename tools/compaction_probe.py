#!/usr/bin/env python
"""Compaction-payoff probe for the two persisted index families.

The compaction rungs (`minhash_index_compact`, `ivfpq_index_compact`)
claim three things the registered queries pin only structurally:

1. repeated appends FRAGMENT the artifact (one small file set per
   append day inside each partition dir);
2. compaction collapses every partition to ONE data file while the
   probe/serve output is unchanged (content-preserving);
3. serving from the compacted artifact is never slower — the probe
   opens one file per partition instead of one per append day, so the
   payoff grows with append-day count (here: 2 days, the floor).

This probe MEASURES all three at $SPARK_GRAFT_SF_DIR (default sf0.1):
for each family it builds base → appends two day-halves → compacts,
then reports per-partition file counts (fragmented vs compacted),
compaction wall, and warm probe wall on both artifacts (min of
``REPS`` runs each, interleaved). Prints one JSON line per family.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def file_counts(root: str, sub: str, prefix: str) -> dict[str, int]:
    out: dict[str, int] = {}
    base = os.path.join(root, sub)
    for d in os.listdir(base):
        if d.startswith(prefix):
            out[d] = sum(
                1
                for f in os.listdir(os.path.join(base, d))
                if f.endswith(".parquet")
            )
    return out


def timed(fn, *args):
    t0 = time.monotonic()
    out = fn(*args)
    return out, round(time.monotonic() - t0, 3)


def drain(df) -> int:
    return df.count()


def main() -> None:
    from pyspark.sql import functions as F

    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators import dedup as dd
    from minimapreduce_spark.operators import similarity as sim
    from minimapreduce_spark.session import get_spark

    spark = get_spark(app_name="compaction_probe")

    # ---- band index -----------------------------------------------------
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = dd.minhash_index_build(spark, SF)
    day1 = docs.where(F.col("doc_id") % dd.APPEND_DAY_MOD == 0)
    day2 = docs.where(
        F.col("doc_id") % dd.APPEND_DAY_MOD == dd.INCR_BATCH_MOD
    )
    a1 = dd.minhash_index_append(spark, SF, day1, base, tag="probe-d1")
    a2 = dd.minhash_index_append(spark, SF, day2, a1, tag="probe-d2")
    c, compact_wall = timed(dd.minhash_index_compact, spark, a2)

    def mh_probe(root: str):
        idx_b = (
            spark.read.schema(dd.MINHASH_BUCKET_SCHEMA)
            .parquet(os.path.join(root, "buckets"))
            .select("doc_id", F.col("band").cast("int").alias("band"), "bh")
        )
        idx_s = spark.read.schema(dd.MINHASH_SHINGLE_SCHEMA).parquet(
            os.path.join(root, "shingles")
        )
        batch = docs.where(F.col("doc_id") % dd.INCR_BATCH_MOD == 0)
        bb, bs = dd._batch_band_frames(spark, SF, batch)
        return dd.probe_band_index(
            spark, SF, batch_buckets=bb, batch_shingles=bs,
            index_buckets=idx_b, index_shingles=idx_s,
        )

    walls = {"frag": [], "comp": []}
    for _ in range(REPS):
        _, w = timed(lambda: drain(mh_probe(a2)))
        walls["frag"].append(w)
        _, w = timed(lambda: drain(mh_probe(c)))
        walls["comp"].append(w)
    print(json.dumps({
        "family": "minhash_band_index",
        "files_per_band_fragmented": file_counts(a2, "buckets", "band="),
        "files_per_band_compacted": file_counts(c, "buckets", "band="),
        "compact_wall_s": compact_wall,
        "probe_wall_fragmented_s": min(walls["frag"]),
        "probe_wall_compacted_s": min(walls["comp"]),
        "rows_equal": sorted(map(tuple, mh_probe(a2).collect()))
        == sorted(map(tuple, mh_probe(c).collect())),
    }))

    # ---- IVF-PQ ---------------------------------------------------------
    vid = F.col("vec_id")
    in_batch = (vid % sim.APPEND_MOD == 0) & (vid >= sim.N_QUERIES)
    d1 = in_batch & (vid % (2 * sim.APPEND_MOD) == 0)
    d2 = in_batch & (vid % (2 * sim.APPEND_MOD) != 0)
    broot = sim.ivfpq_base_index_build(spark, SF)
    p1 = sim.ivfpq_index_append(spark, SF, d1, broot, tag="probe-d1")
    p2 = sim.ivfpq_index_append(spark, SF, d2, p1, tag="probe-d2")
    pc, pq_compact_wall = timed(sim.ivfpq_index_compact, spark, p2)

    def pq_serve(root: str):
        cg = spark.read.parquet(os.path.join(root, "centroids"))
        cb = spark.read.parquet(os.path.join(root, "codebook"))
        code_arr = spark.read.parquet(os.path.join(root, "codes")).select(
            "vec_id", F.col("label").cast("int").alias("label"), "code", "n2hat"
        )
        return sim._ivfpq_serve(spark, SF, cg, cb, code_arr, nprobe=1)

    walls = {"frag": [], "comp": []}
    for _ in range(REPS):
        _, w = timed(lambda: drain(pq_serve(p2)))
        walls["frag"].append(w)
        _, w = timed(lambda: drain(pq_serve(pc)))
        walls["comp"].append(w)
    print(json.dumps({
        "family": "ivfpq_index",
        "files_per_cell_fragmented": file_counts(p2, "codes", "label="),
        "files_per_cell_compacted": file_counts(pc, "codes", "label="),
        "compact_wall_s": pq_compact_wall,
        "serve_wall_fragmented_s": min(walls["frag"]),
        "serve_wall_compacted_s": min(walls["comp"]),
        "rows_equal": sorted(map(tuple, pq_serve(p2).collect()))
        == sorted(map(tuple, pq_serve(pc).collect())),
    }))


if __name__ == "__main__":
    main()

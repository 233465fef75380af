#!/usr/bin/env python
"""Retention (VACUUM) payoff probe: build → append ×2 → compact chains
for both index families at $SPARK_GRAFT_SF_DIR (default sf0.1) inside
an isolated parent dir, then vacuum and report what a nightly
retention sweep reclaims — deleted roots, bytes unlinked vs bytes
actually freed (hardlinked data shared with the surviving leaf is
unlinked but NOT freed), and a leaf-still-serves row count after the
sweep. One JSON line per family."""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from minimapreduce_spark.artifacts import vacuum_superseded_roots
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators import dedup as dd
    from minimapreduce_spark.operators import similarity as sim
    from minimapreduce_spark.session import get_spark

    spark = get_spark(app_name="retention_probe")
    parent = tempfile.mkdtemp(prefix="retention_probe_")

    # ---- band index ------------------------------------------------------
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = os.path.join(parent, "minimapreduce_minhash_probe")
    dd.minhash_index_build(spark, SF, root=base)
    day1 = docs.where(F.col("doc_id") % dd.APPEND_DAY_MOD == 0)
    day2 = docs.where(F.col("doc_id") % dd.APPEND_DAY_MOD == dd.INCR_BATCH_MOD)
    a1 = dd.minhash_index_append(spark, SF, day1, base, tag="ret-d1")
    a2 = dd.minhash_index_append(spark, SF, day2, a1, tag="ret-d2")
    comp = dd.minhash_index_compact(spark, a2)
    rep = vacuum_superseded_roots(
        parent, "minimapreduce_minhash_", "buckets", min_age_s=0.0
    )
    leaf_rows = (
        spark.read.schema(dd.MINHASH_BUCKET_SCHEMA)
        .parquet(os.path.join(comp, "buckets"))
        .count()
    )
    print(json.dumps({
        "family": "minhash_band_index",
        "deleted_roots": len(rep["deleted"]),
        "kept_live": rep["kept_live"],
        "unlinked_mb": round(rep["unlinked_bytes"] / 1e6, 2),
        "freed_mb": round(rep["freed_bytes"] / 1e6, 2),
        "leaf_bucket_rows_after_vacuum": leaf_rows,
    }))

    # ---- IVF-PQ ----------------------------------------------------------
    vid = F.col("vec_id")
    in_batch = (vid % sim.APPEND_MOD == 0) & (vid >= sim.N_QUERIES)
    d1 = in_batch & (vid % (2 * sim.APPEND_MOD) == 0)
    d2 = in_batch & (vid % (2 * sim.APPEND_MOD) != 0)
    broot = os.path.join(parent, "minimapreduce_ivfpq_probe")
    sim.ivfpq_base_index_build(spark, SF, root=broot)
    p1 = sim.ivfpq_index_append(spark, SF, d1, broot, tag="ret-d1")
    p2 = sim.ivfpq_index_append(spark, SF, d2, p1, tag="ret-d2")
    pc = sim.ivfpq_index_compact(spark, p2)
    rep = vacuum_superseded_roots(
        parent, "minimapreduce_ivfpq_", "codes", min_age_s=0.0
    )
    leaf_rows = spark.read.parquet(os.path.join(pc, "codes")).count()
    print(json.dumps({
        "family": "ivfpq_index",
        "deleted_roots": len(rep["deleted"]),
        "kept_live": rep["kept_live"],
        "unlinked_mb": round(rep["unlinked_bytes"] / 1e6, 2),
        "freed_mb": round(rep["freed_bytes"] / 1e6, 2),
        "leaf_code_rows_after_vacuum": leaf_rows,
    }))


if __name__ == "__main__":
    main()

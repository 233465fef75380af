#!/usr/bin/env python
"""Stage-level breakdown of the inline ANN training chains
(ann_pq_adc_topk / ann_ivfpq_topk) — times each pipeline prefix through
the noop sink in one warm session so the residue the round-10/11
verdicts called "paid by design" is attributed operator by operator.

Usage: python tools/pq_stage_probe.py [pq|ivfpq] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from minimapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(df, label, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "pq"
    spark = get_spark(app_name="pq_stage_probe")
    import minimapreduce_spark.operators.similarity as sim

    if which == "pq":
        q = sim.ann_pq_adc_topk
        # warm
        q(spark, SF).write.format("noop").mode("overwrite").save()
        t(q(spark, SF), "FULL ann_pq_adc_topk")
        sub = sim._pq_subvectors(spark, SF)
        t(sub, "1 subvectors")
        cb = sim._pq_train(spark, SF, sub)
        t(cb, "2 train (local kernel)")
        codes = sim._pq_assign(sub, cb, keep_sq=False)
        t(codes, "3 encode codes")
        sq_n2 = F.aggregate(
            F.transform("ce", lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        cn2 = cb.select("m", "cid", sq_n2.alias("n2"))
        xn2 = (
            codes.join(F.broadcast(cn2), ["m", "cid"])
            .groupBy("vec_id")
            .agg(F.sum("n2").alias("n2hat"))
        )
        t(xn2, "4 xn2")
        code_arr = (
            codes.groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "cid"))),
                    lambda x: x["cid"],
                ).alias("code")
            )
            .join(xn2, "vec_id")
        )
        t(code_arr, "5 code_arr (+xn2 join)")
        t(q(spark, SF), "FULL again")
    elif which == "ivfpq":
        q = sim._ivfpq_topk_plan
        q(spark, SF).write.format("noop").mode("overwrite").save()
        t(q(spark, SF), "FULL ann_ivfpq_topk")
        cg, cb, code_arr = sim._ivfpq_index_frames(spark, SF)
        t(cg, "1 cell centroids cg")
        rsub = sim._ivfpq_rsub(spark, SF, cg)
        t(rsub, "2 rsub")
        t(cb, "3 train")
        t(code_arr, "4 encode code_arr")
        t(sim._ivfpq_serve(spark, SF, cg, cb, code_arr), "5 serve-only")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Cross-engine ln-exactness probe for the unigram EM quantization
(round-11 verdict item 7): collect every (numerator, denominator)
probability ratio the unigram trainer feeds into
round(ln(num/den) * UNI_LP_SCALE) at each fixture SF, and compare the
quantized value computed three ways:

  - JVM  : java.lang.Math.log via py4j (bit-identical to what Spark's
           Log expression computes in local mode — same JVM);
  - libm : Python math.log (what a driver-local numpy/python kernel
           would use);
  - Spark: F.round(F.log(...)*scale) evaluated through a real plan.

If all three agree on every encountered grid point, the driver-local
EM kernel is safe; any disagreement is a hard blocker (paid-by-design).
"""

from __future__ import annotations

import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from minimapreduce_spark.session import get_spark  # noqa: E402


def q_half_up(x: float, scale: int) -> int:
    """Spark's round(double, 0): exact BigDecimal of the double,
    HALF_UP — replicated via Decimal(float) which is exact."""
    return int(
        Decimal(x * scale).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def ratios_for_sf(spark, sf_dir):
    """Every (num, den) pair the trainer quantizes at this SF, by
    replaying the v0/counts frames of _uni_train."""
    import minimapreduce_spark.operators.text_analysis as ta

    wf, v0, counts, _lp = ta._uni_train(spark, sf_dir)
    pairs = []
    v0_rows = v0.collect()
    t = sum(int(r["pfreq"]) for r in v0_rows)
    pairs += [(int(r["pfreq"]), t) for r in v0_rows]
    n_vocab = len(v0_rows)
    for cnt in counts:
        rows = cnt.collect()
        ct = sum(int(r["c"]) for r in rows)
        pairs += [(int(r["c"]) + 1, ct + n_vocab) for r in rows]
    return pairs


def main() -> None:
    spark = get_spark(app_name="uni_ln_grid_probe", master="local[8]",
                      shuffle_partitions=8)
    jvm_log = spark._jvm.java.lang.Math.log  # type: ignore[attr-defined]
    import minimapreduce_spark.operators.text_analysis as ta

    scale = ta.UNI_LP_SCALE
    bad = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        pairs = sorted(set(ratios_for_sf(spark, sf_dir)))
        # spark-side quantization of each ratio through a real plan
        df = spark.createDataFrame(pairs, "num bigint, den bigint").select(
            "num", "den",
            F.round(F.log(F.col("num") * 1.0 / F.col("den")) * scale)
            .cast("bigint").alias("lp"),
        )
        spark_lp = {(r["num"], r["den"]): int(r["lp"]) for r in df.collect()}
        for num, den in pairs:
            x = num * 1.0 / den
            v_libm = q_half_up(math.log(x) * scale, 1)
            v_jvm = q_half_up(jvm_log(x) * scale, 1)
            v_spark = spark_lp[(num, den)]
            if not (v_libm == v_jvm == v_spark):
                bad += 1
                print(f"DISAGREE {sf} {num}/{den}: libm={v_libm} "
                      f"jvm={v_jvm} spark={v_spark}")
        print(f"{sf}: {len(pairs)} distinct ratios, all-agree={bad == 0}")
    print("VERDICT:", "SAFE" if bad == 0 else f"{bad} DISAGREEMENTS")


if __name__ == "__main__":
    main()

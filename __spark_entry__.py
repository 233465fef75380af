"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`minimapreduce_spark.queries` — the engine's query
registry. Each registered query pairs a Spark plan with a DuckDB oracle
SQL string (SURVEY §5's sequential-oracle protocol, generalized).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from minimapreduce_spark import queries as _q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: word count over documents.text —
    the reference's canonical app (mrapps/wc.go), exercising
    scan → flatMap → shuffle → agg → (driver-side collect)."""
    return _q.queries()["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return _q.oracles()

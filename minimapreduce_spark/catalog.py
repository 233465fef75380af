"""Table catalog over the driver-generated parquet test data.

The reference's "catalog" was a CLI file list — one text file per map
split (mr/master.go:327-338). Here sources are real columnar tables with
schemas; ``spark.read.parquet`` gives partition-pruned, column-pruned,
filter-pushed scans for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; supplier/part/customer grow with SF but
# stay dims relative to lineitem/orders facts).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Keep this the single entry point for scans so the
    whole engine inherits any source-level change (format, bucketing,
    partition layout) in one place."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so SQL-form operators can run against them."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

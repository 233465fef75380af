"""Custom source via Spark 4's Python DataSource API.

The reference's entire source layer is "one CLI file = one map split =
one task" (mr/master.go:327-338, mr/worker.go:59-68). This module
re-expresses that contract with the modern extension point: a
``DataSource`` whose reader plans one ``InputPartition`` per shard —
each shard read independently by one task, exactly the reference's
split model — while Spark handles scheduling, retries, and Arrow
transport.

The source is a deterministic synthetic log generator (seedless — pure
arithmetic in the row id), so its content is closed-form and the DuckDB
oracle can recompute it from ``range()``: a full-fidelity correctness
check for a *custom source*, something file-based fixtures can't give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from minimapreduce_spark.registry import register

MULT = 2654435761  # Knuth multiplicative-hash constant
MOD = 997
N_ROWS = 20_000
N_SHARDS = 8


class _ShardPartition(InputPartition):
    def __init__(self, start: int, end: int, shard: int):
        self.start, self.end, self.shard = start, end, shard


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", N_ROWS))
        self.n_shards = int(options.get("n_shards", N_SHARDS))

    def partitions(self):
        """One InputPartition per shard — the reference's file=split
        model; Spark runs one task per returned partition."""
        per = -(-self.n_rows // self.n_shards)  # ceil
        return [
            _ShardPartition(s * per, min((s + 1) * per, self.n_rows), s)
            for s in range(self.n_shards)
            if s * per < self.n_rows
        ]

    def read(self, partition: _ShardPartition):
        for i in range(partition.start, partition.end):
            yield (i, partition.shard, f"w{i % 7}", (i * MULT) % MOD)


class SynthLogDataSource(DataSource):
    """``spark.read.format("synthlog")`` — registered per-session via
    ``spark.dataSource.register``."""

    @classmethod
    def name(cls) -> str:
        return "synthlog"

    def schema(self) -> str:
        return "id bigint, shard int, word string, val bigint"

    def reader(self, schema) -> SynthLogReader:
        return SynthLogReader(self.options)


@register(
    "pysource_partitioned_scan",
    oracle=f"""
    SELECT 'w' || CAST(i % 7 AS VARCHAR) AS word,
           count(*) AS n_rows,
           CAST(sum((i * {MULT}) % {MOD}) AS BIGINT) AS total_val,
           min(i) AS min_id, max(i) AS max_id
    FROM range(0, {N_ROWS}) t(i)
    GROUP BY 1
    """,
)
def pysource_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python DataSource: registers the
    format, scans 8 planned partitions in parallel, and rolls
    up by derived word — proving rows, types, and partition planning
    all round-trip through the DataSource API.

    The oracle recomputes the generator's closed form over range():
    the source IS the query, so any partition-planning bug (dropped
    shard, duplicated boundary row, ceil-division off-by-one) breaks
    the hash.

    Scale posture: sources that generate/fetch (JDBC ranges, REST
    pages, synthetic load) parallelize exactly this way — partition
    planning on the driver, O(1) driver memory, each task streaming
    its own slice through Arrow.
    """
    spark.dataSource.register(SynthLogDataSource)
    df = spark.read.format("synthlog").option("n_rows", N_ROWS).option(
        "n_shards", N_SHARDS
    ).load()
    return df.groupBy("word").agg(
        F.count("*").alias("n_rows"),
        F.sum("val").alias("total_val"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


@register(
    "binaryfile_manifest",
    oracle="""
    -- The driver contract fixes the correctness scale at sf0.01, and
    -- oracle SQL runs verbatim (no parameter substitution), so this is
    -- the one oracle that must name the path literally. The scale_dir
    -- column guards the hardcoding: if the Spark side ever runs at a
    -- different sf_dir, every row hash-mismatches on the directory name
    -- instead of silently comparing against the wrong fixture.
    SELECT regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS scale_dir,
           regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           CAST(size AS BIGINT) AS n_bytes
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
)
def binaryfile_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest manifest via Spark's ``binaryFile`` source — the entry
    point for multimodal payloads (images/audio/video arrive as opaque
    bytes + metadata, operators/multimodal.py takes over from there):
    one row per file with name and size.

    Content checksums are pinned in pytest against hashlib instead,
    since DuckDB's blob surface lacks a portable digest.

    Scale posture: binaryFile plans one split per file (the reference's
    file=split model, mr/master.go:327-338, again) and streams bytes
    lazily; the manifest projection never loads content.
    """
    df = (
        spark.read.format("binaryFile")
        .load(f"{sf_dir}/*.parquet")
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)/[^/]+$", 1).alias("scale_dir"),
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file_name"),
            F.col("length").cast("bigint").alias("n_bytes"),
        )
    )
    return df

"""Source/sink layer: format round-trips, whole-file semantics,
partitioned-write pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minimapreduce_spark import plans
from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.sources import read_source, whole_text_files, write_sink

from tests.conftest import SF_DIR


@pytest.fixture()
def nation(spark):
    return load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, nation, tmp_path, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    write_sink(nation, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_text_round_trip(spark, nation, tmp_path):
    """'key value' line sink/source — the reference's output format
    (mr/worker.go:159-174)."""
    path = str(tmp_path / "kv_text")
    kv = nation.select(F.format_string("%s %s", "n_name", "n_nationkey").alias("value"))
    write_sink(kv, path, fmt="text")
    back = read_source(spark, path, fmt="text")
    assert sorted(r.value for r in back.collect()) == sorted(r.value for r in kv.collect())


def test_whole_text_files(spark, tmp_path):
    files = {"a.txt": "alpha beta", "b.txt": "gamma"}
    for name, content in files.items():
        (tmp_path / name).write_text(content)
    df = whole_text_files(spark, str(tmp_path / "*.txt"))
    got = {r.path.rsplit("/", 1)[-1]: r.content for r in df.collect()}
    assert got == files


def test_partitioned_write_prunes(spark, nation, tmp_path):
    """Hive-partitioned parquet: a filter on the partition column must
    become a PartitionFilter (directory skip), not a data filter."""
    path = str(tmp_path / "nation_part")
    write_sink(nation, path, fmt="parquet", partition_by=["n_regionkey"])
    back = read_source(spark, path, fmt="parquet").where(F.col("n_regionkey") == 2)
    plan = plans.physical_plan(back)
    assert "PartitionFilters" in plan and "n_regionkey" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == nation.where("n_regionkey = 2").count()


def test_sorted_write_produces_skippable_row_groups(spark, tmp_path):
    """write_sorted must yield parquet whose row-group min/max stats on
    the sort key are tight and non-overlapping WITHIN each file, and
    whose files cover disjoint key ranges — the physical property that
    lets range predicates skip data instead of scanning it."""
    import glob as globmod

    import pyarrow.parquet as pq

    from minimapreduce_spark.sources.formats import write_sorted

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    path = str(tmp_path / "li_sorted")
    write_sorted(li, path, ["l_shipdate"], n_files=4)

    file_ranges = []
    for f in sorted(globmod.glob(path + "/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        groups = [
            (meta.row_group(g).column(idx).statistics.min,
             meta.row_group(g).column(idx).statistics.max)
            for g in range(meta.num_row_groups)
        ]
        # sorted within the file: row-group ranges are ordered
        for (lo1, hi1), (lo2, _hi2) in zip(groups, groups[1:]):
            assert hi1 <= lo2, f"row groups overlap in {f}: {groups}"
        file_ranges.append((groups[0][0], groups[-1][1]))

    assert len(file_ranges) >= 2, "expected multiple range-partitioned files"
    # files cover disjoint key ranges
    file_ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(file_ranges, file_ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {file_ranges}"

    # and the layout is lossless
    back = read_source(spark, path, fmt="parquet")
    assert back.count() == li.count()


def test_compact_small_files(spark, tmp_path):
    """64 tiny files in, a handful out, zero rows lost — and the output
    file count is derived from real input bytes, not guessed."""
    import glob as globmod

    from minimapreduce_spark.sources.formats import compact_small_files

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    small = str(tmp_path / "small")
    li.repartition(64).write.parquet(small)
    assert len(globmod.glob(small + "/part-*.parquet")) == 64

    compacted = str(tmp_path / "compacted")
    n = compact_small_files(spark, small, compacted, target_file_bytes=1 << 20)
    files = globmod.glob(compacted + "/part-*.parquet")
    assert len(files) <= n < 64
    back = spark.read.parquet(compacted)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_orderkey")).first()[0] == li.agg(F.sum("l_orderkey")).first()[0]


def test_pydatasource_partition_invariance(spark):
    """The custom Python DataSource must return identical rows no
    matter how many shards plan it (the reference's nReduce contract
    applied to the source side), and must actually honor the planned
    partition count."""
    from minimapreduce_spark.sources.pydatasource import SynthLogDataSource

    spark.dataSource.register(SynthLogDataSource)

    def load(shards):
        return (
            spark.read.format("synthlog")
            .option("n_rows", 1000)
            .option("n_shards", shards)
            .load()
        )

    assert load(3).rdd.getNumPartitions() == 3
    # shard is provenance metadata (like input_file_name) — it moves
    # with the plan; the data columns must not.
    a = sorted(tuple(r) for r in load(3).drop("shard").collect())
    b = sorted(tuple(r) for r in load(7).drop("shard").collect())
    assert a == b and len(a) == 1000
    ids = [r[0] for r in a]
    assert ids == list(range(1000))  # no dropped/duplicated boundary rows


def test_binaryfile_manifest_checksums(spark):
    """The binaryFile source's bytes must be the real file bytes:
    Spark-side sha2 equals hashlib over the same files (the digest
    check the DuckDB oracle can't express)."""
    import glob
    import hashlib

    import pyspark.sql.functions as F

    df = (
        spark.read.format("binaryFile")
        .load(f"{SF_DIR}/*.parquet")
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("name"),
            F.col("length"),
            F.sha2("content", 256).alias("digest"),
        )
    )
    got = {r["name"]: (r["length"], r["digest"]) for r in df.collect()}
    for path in glob.glob(f"{SF_DIR}/*.parquet"):
        data = open(path, "rb").read()
        name = path.rsplit("/", 1)[1]
        assert got[name] == (len(data), hashlib.sha256(data).hexdigest())


def test_dynamic_partition_overwrite_preserves_other_partitions(spark, nation, tmp_path):
    """INSERT OVERWRITE with dynamic partitionOverwriteMode must
    replace only the partitions present in the incoming batch - the
    incremental-backfill write pattern; static mode would wipe the
    whole table."""
    path = str(tmp_path / "nation_dyn")
    nation.write.partitionBy("n_regionkey").parquet(path)
    before = spark.read.parquet(path)
    n_before = before.count()
    n_r2 = before.where("n_regionkey = 2").count()

    patch = (
        nation.where("n_regionkey = 2")
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_V2")))
    )
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("n_regionkey")
        .parquet(path)
    )
    after = spark.read.parquet(path)
    assert after.count() == n_before  # other partitions intact
    assert after.where("n_regionkey = 2").count() == n_r2
    assert after.where("n_name LIKE '%_V2'").count() == n_r2
    assert after.where("n_regionkey != 2 AND n_name LIKE '%_V2'").count() == 0


def test_publish_atomic_swaps_complete_versions(spark, nation, tmp_path):
    """After a republish, readers see the complete new version; the
    prior version survives as .old for rollback; a staging failure
    leaves the published data untouched."""
    import os

    from minimapreduce_spark.sources.formats import publish_atomic

    final = str(tmp_path / "nation_pub")
    publish_atomic(nation, final)
    assert spark.read.parquet(final).count() == nation.count()

    v2 = nation.withColumn("n_name", F.upper("n_name"))
    publish_atomic(v2, final)
    after = spark.read.parquet(final)
    assert after.count() == nation.count()
    assert after.where(F.col("n_name") != F.upper(F.col("n_name"))).count() == 0
    assert os.path.exists(final + ".old")
    old = spark.read.parquet(final + ".old")
    assert old.count() == nation.count()


def test_csv_malformed_rows_permissive_vs_failfast(spark, tmp_path):
    """Ingestion robustness semantics: PERMISSIVE mode quarantines
    malformed rows into the corrupt-record column (dead-letter
    accounting, same doctrine as try_arithmetic_semantics) while
    FAILFAST aborts on first touch — both explicit choices, never
    silent row drops."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "dirty.csv")
    with open(path, "w") as f:
        f.write("id,qty,price\n")
        f.write("1,10,9.99\n")
        f.write("2,not_a_number,5.00\n")
        f.write("3,7,bad_price\n")
        f.write("4,3,1.25\n")

    schema = "id int, qty int, price double, _corrupt string"
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    rows = df.cache().collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(rows) == 4 and len(good) == 2 and len(bad) == 2
    assert {r["id"] for r in good} == {1, 4}
    assert all(r["_corrupt"].startswith(("2,", "3,")) for r in bad)
    df.unpersist()

    strict = (
        spark.read.schema("id int, qty int, price double")
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )
    try:
        strict.collect()
        raise AssertionError("FAILFAST accepted malformed rows")
    except Exception as exc:  # Py4JJavaError or PySparkException by version
        assert not isinstance(exc, AssertionError)
        assert "FAILFAST" in str(exc) or "MALFORMED" in str(exc)


def test_publish_atomic_rejects_remote_uris(spark):
    import pytest

    from minimapreduce_spark.sources.formats import publish_atomic

    df = spark.range(1)
    for uri in ("hdfs://nn/data/t", "s3a://bucket/t", "file:///tmp/t"):
        with pytest.raises(ValueError, match="local filesystem"):
            publish_atomic(df, uri)

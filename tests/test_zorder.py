"""Z-order clustering layout (operators/scale.py): prove the 2-D
data-skipping claim with real parquet footers — after write_zordered,
file-level min/max statistics must prune a box predicate on the
NON-leading dimension far better than a single-column-sorted layout."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from minimapreduce_spark.operators.scale import write_zordered, zorder_col
from tests.conftest import SF_DIR

N_FILES = 16


def _file_ranges(path: str, x: str, y: str) -> list[tuple]:
    """Per-file (min, max) of both columns from parquet footers —
    exactly what a scan's file-skipping sees."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        xs, ys = [], []
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            cols = {row.column(i).path_in_schema: row.column(i) for i in range(row.num_columns)}
            xs += [cols[x].statistics.min, cols[x].statistics.max]
            ys += [cols[y].statistics.min, cols[y].statistics.max]
        out.append((min(xs), max(xs), min(ys), max(ys)))
    return out


def _overlapping(ranges, lo_x=None, hi_x=None, lo_y=None, hi_y=None) -> int:
    n = 0
    for xmin, xmax, ymin, ymax in ranges:
        ok = True
        if lo_x is not None:
            ok = ok and xmax >= lo_x and xmin <= hi_x
        if lo_y is not None:
            ok = ok and ymax >= lo_y and ymin <= hi_y
        n += ok
    return n


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("layout"))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2023-01-01").cast("date")).alias("day"),
    )
    sorted_path = os.path.join(base, "by_custkey")
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    z_path = os.path.join(base, "zorder")
    write_zordered(orders, z_path, "o_custkey", "day", N_FILES)
    return orders, sorted_path, z_path


def test_zorder_preserves_rows(spark, layouts):
    orders, _, z_path = layouts
    back = spark.read.parquet(z_path)
    assert back.count() == orders.count()
    assert (
        back.agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )


def test_zorder_skips_on_both_dimensions(spark, layouts):
    """For a day-range predicate, the custkey-sorted layout can prune
    nothing (every file spans all days) while the Z-order layout must
    skip at least half the files; for a custkey range, Z-order must
    still prune (it trades a little leading-column locality for
    coverage of both)."""
    orders, sorted_path, z_path = layouts
    lo_d, hi_d = orders.agg(F.min("day"), F.max("day")).first()
    lo_c, hi_c = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    day_box = (lo_d, lo_d + (hi_d - lo_d) // 8)
    cust_box = (lo_c, lo_c + (hi_c - lo_c) // 8)

    srt = _file_ranges(sorted_path, "o_custkey", "day")
    zrd = _file_ranges(z_path, "o_custkey", "day")
    assert len(zrd) == N_FILES

    # Non-leading dimension: sorted-by-custkey layout reads everything.
    srt_day = _overlapping(srt, lo_y=day_box[0], hi_y=day_box[1])
    zrd_day = _overlapping(zrd, lo_y=day_box[0], hi_y=day_box[1])
    assert srt_day == len(srt)
    assert zrd_day <= N_FILES // 2, f"zorder read {zrd_day}/{N_FILES} files for a 1/8 day slice"

    # Leading dimension: zorder still prunes.
    zrd_cust = _overlapping(zrd, lo_x=cust_box[0], hi_x=cust_box[1])
    assert zrd_cust <= N_FILES // 2

    # 2-D box: pruning composes.
    zrd_box = _overlapping(
        zrd, lo_x=cust_box[0], hi_x=cust_box[1], lo_y=day_box[0], hi_y=day_box[1]
    )
    assert zrd_box <= min(zrd_day, zrd_cust)


def test_zorder_col_is_monotone_in_tiles(spark):
    """Sanity: interleaving maps a 4×4 grid of (x, y) quadrants to
    distinct contiguous key ranges (the space-filling property)."""
    rows = spark.range(16).select(
        (F.col("id") % 4).cast("int").alias("x"),
        (F.col("id") / 4).cast("int").alias("y"),
    )
    out = rows.select("x", "y", zorder_col(F.col("x"), F.col("y"), bits=2).alias("z")).collect()
    zs = {(r["x"], r["y"]): r["z"] for r in out}
    assert sorted(zs.values()) == list(range(16))  # bijective on the grid
    assert zs[(0, 0)] == 0 and zs[(1, 0)] == 2 and zs[(0, 1)] == 1 and zs[(3, 3)] == 15


def test_normalized_dim_exact_beyond_double_range(spark):
    """pos × 65535 above 2^53 must still floor-divide exactly (decimal
    path): epoch-micros-scale spans diverge under double arithmetic."""
    import pyspark.sql.functions as F

    from minimapreduce_spark.operators.scale import normalized_dim

    lo, hi = 0, 1_700_000_000_000_000  # ~54 years of epoch micros
    vals = [0, 1, hi // 3, hi // 3 + 1, hi - 1, hi, 123_456_789_012_345]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    got = {
        r.v: r.n
        for r in df.select(
            "v",
            normalized_dim(F.col("v"), F.lit(lo), F.lit(hi)).alias("n"),
        ).collect()
    }
    span = hi - lo
    for v in vals:
        assert got[v] == (v * 65535) // span, (v, got[v], (v * 65535) // span)

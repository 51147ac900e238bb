"""Z-order clustered write (sources/io.py:write_zorder +
functions/zorder.py): the layout must make parquet footer min/max
stats selective on BOTH clustered dimensions, where a single-column
sort is selective on one and useless on the other. Measured here on
real written files, not asserted from theory."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from quebic_spark.functions.zorder import interleave_bits, range_bucket
from quebic_spark.sources.io import write_zorder


def _file_ranges(root: str, col: str) -> list[tuple]:
    """Per-data-file (min, max) of ``col`` from parquet footers."""
    out = []
    for f in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _overlapping(ranges: list[tuple], lo, hi) -> int:
    return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )


@pytest.fixture(scope="module")
def layouts(spark, events, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    zpath = str(base / "zorder")
    spath = str(base / "usersort")
    write_zorder(spark, events, zpath, ["user_id", "value"])
    # baseline: same file count, clustered on user_id alone
    (events.repartitionByRange(16, "user_id")
     .sortWithinPartitions("user_id")
     .write.mode("overwrite").parquet(spath))
    return zpath, spath


def _mid_band(vals, frac_lo=0.45, frac_hi=0.55):
    mn, mx = min(vals), max(vals)
    return (mn + (mx - mn) * frac_lo, mn + (mx - mn) * frac_hi)


def test_zorder_skips_on_both_dimensions(events, layouts):
    zpath, spath = layouts
    rows = events.collect()
    u_lo, u_hi = _mid_band([r.user_id for r in rows])
    v_lo, v_hi = _mid_band([r.value for r in rows])

    zu = _file_ranges(zpath, "user_id")
    zv = _file_ranges(zpath, "value")
    su = _file_ranges(spath, "user_id")
    sv = _file_ranges(spath, "value")
    assert len(zu) >= 8, "expected one file per populated curve slice"

    # z-order: a 10%-wide band on EITHER dimension must let footer
    # stats prune at least a third of the files (top-2-bits-per-dim
    # slices form a 4x4 rectangle grid; a 10% band crosses <= 2 strips)
    assert _overlapping(zu, u_lo, u_hi) <= len(zu) * 2 / 3
    assert _overlapping(zv, v_lo, v_hi) <= len(zv) * 2 / 3

    # single-column sort: selective on its own column...
    assert _overlapping(su, u_lo, u_hi) <= len(su) / 2
    # ...but every file spans essentially the full other dimension
    assert _overlapping(sv, v_lo, v_hi) >= len(sv) - 1


def test_zorder_roundtrip_preserves_rows(spark, events, layouts):
    zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    a = sorted(r.event_id for r in back.select("event_id").collect())
    b = sorted(r.event_id for r in events.select("event_id").collect())
    assert a == b


def test_zorder_layout_deterministic(spark, events, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_zorder(spark, events, p1, ["user_id", "value"])
    write_zorder(spark, events, p2, ["user_id", "value"])

    def layout(root):
        out = {}
        for d in sorted(os.listdir(root)):
            if not d.startswith("zfile="):
                continue
            df = spark.read.parquet(os.path.join(root, d))
            out[d] = sorted(r.event_id for r in df.collect())
        return out

    assert layout(p1) == layout(p2)


def test_interleave_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 255)],
        "a long, b long",
    )
    got = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")]).alias("z")
    ).collect()
    for r in got:
        expect = 0
        for bit in range(8):
            expect |= ((r.a >> bit) & 1) << (2 * bit)
            expect |= ((r.b >> bit) & 1) << (2 * bit + 1)
        assert r.z == expect, (r.a, r.b, r.z, expect)


def test_range_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (99.999,), (100.0,)], "x double"
    )
    got = [
        r.b for r in df.select(
            range_bucket(F.col("x"), F.lit(0.0), F.lit(100.0)).alias("b")
        ).collect()
    ]
    assert got[0] == 0
    assert got[1] == 128
    assert got[2] == 255
    assert got[3] == 255  # max value clamps into the top bucket

    # degenerate range: everything lands in bucket 0, no NaN/div0
    one = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    vals = [
        r.b for r in one.select(
            range_bucket(F.col("x"), F.lit(7.0), F.lit(7.0)).alias("b")
        ).collect()
    ]
    assert vals == [0, 0]


def test_write_zorder_validates_args(spark, events):
    with pytest.raises(ValueError):
        write_zorder(spark, events, "/tmp/never", [])
    with pytest.raises(ValueError):
        write_zorder(spark, events, "/tmp/never", ["user_id"],
                     bits=8, file_bits=9)


def test_write_zorder_rejects_reserved_columns(spark, events):
    with pytest.raises(ValueError, match="reserved"):
        write_zorder(
            spark, events.withColumn("zval", F.lit(1)), "/tmp/never",
            ["user_id", "value"],
        )


def test_range_bucket_nulls_land_in_bucket_zero(spark):
    """r15 review: least() skips NULLs, so a NULL column value
    silently took the TOP bucket and scattered null rows into the
    max-value curve slices."""
    from pyspark.sql import functions as F

    from quebic_spark.functions.zorder import range_bucket

    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (None,)], "v double"
    )
    mn, mx = F.lit(0.0), F.lit(100.0)
    out = [
        r["b"]
        for r in df.select(
            range_bucket(F.col("v"), mn, mx).alias("b")
        ).collect()
    ]
    assert out[0] == 0 and out[2] == 255 and out[3] == 0, out


def test_zorder_keys_rejects_reserved_min_max_columns(spark):
    """r15 review: a pre-existing _mn_<col> made the post-crossJoin
    reference ambiguous, failing as an internals-pointing
    AnalysisException."""
    import pytest
    from pyspark.sql import functions as F

    from quebic_spark.functions.zorder import zorder_keys

    df = spark.range(10).select(
        F.col("id").alias("price"), F.lit(1).alias("_mn_price")
    )
    with pytest.raises(ValueError, match="_mn_price"):
        zorder_keys(df, ["price"])

"""Focused tests for the scan-parallelism guards (partitioning.py): fan_out
raises a starved input to cluster parallelism, pack_waves coalesces a
slightly over-split input down to one wave — and neither ever fires outside
its regime or changes results."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_to_geocore_spark.partitioning import fan_out, pack_waves


def test_fan_out_raises_starved_input_only(spark):
    p = spark.sparkContext.defaultParallelism
    one = spark.range(1000).coalesce(1)
    assert fan_out(one).rdd.getNumPartitions() == p
    wide = spark.range(1000).repartition(p + 3)
    assert fan_out(wide) is wide  # never lowers


def test_pack_waves_regimes(spark):
    p = spark.sparkContext.defaultParallelism
    # slightly over-split -> packed to exactly one wave
    ragged = spark.range(10_000).repartition(2 * p)
    assert pack_waves(ragged).rdd.getNumPartitions() == p
    # at or below parallelism -> untouched (fan_out's job, not ours)
    under = spark.range(1000).coalesce(1)
    assert pack_waves(under) is under
    # far above the factor bound (the 100 TB scan shape) -> untouched
    huge = spark.range(10_000).repartition(5 * p)
    assert pack_waves(huge) is huge
    # the boundary itself is packed
    edge = spark.range(10_000).repartition(4 * p)
    assert pack_waves(edge).rdd.getNumPartitions() == p


def test_pack_waves_adds_no_exchange(spark):
    import contextlib
    import io

    p = spark.sparkContext.defaultParallelism
    df = pack_waves(spark.range(10_000).repartition(2 * p).select((F.col("id") * 2).alias("v")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Coalesce" in plan
    # exactly the one repartition exchange the fixture itself created
    # (formatted output names each node twice: tree + detail section)
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_encode_stage_rows_identical_under_packing(spark):
    """pack_waves in encode_stage is partitioning-only: the encoded rows of
    a deliberately over-split input match the single-partition truth."""
    from stac_to_geocore_spark.fixtures import images_df
    from stac_to_geocore_spark.pipeline import encode_stage

    p = spark.sparkContext.defaultParallelism
    imgs = images_df(spark, 2_000, bytes_mode="none")
    base = sorted(encode_stage(imgs.coalesce(1)).collect())
    packed = sorted(encode_stage(imgs.repartition(2 * p)).collect())
    assert base == packed


def test_plan_salts_flat_dense_histogram_returns_empty(spark):
    """Bounded-memory regression (round-6 review): a dense, near-flat
    histogram — every cell well above any absolute threshold but none hot
    relative to the mean — must salt nothing, and the one-job rollup only
    ever aggregates into bucket-capped hash maps (no collect_list of the
    whole histogram)."""
    from pyspark.sql import functions as F

    from stac_to_geocore_spark.spatial.skew import plan_salts

    # 5000 cells x ~200 rows each: flat, dense
    pts = spark.range(1_000_000).select((F.col("id") % 5000).alias("cell"))
    assert plan_salts(pts, sample_fraction=1.0) == {}


def test_plan_salts_one_hot_cell_among_dense_flat(spark):
    """The hot cell must still surface through the bucketed rollup."""
    from pyspark.sql import functions as F

    from stac_to_geocore_spark.spatial.skew import plan_salts

    flat = spark.range(100_000).select((F.col("id") % 1000).alias("cell"))
    hot = spark.range(50_000).select(F.lit(7777).alias("cell"))
    salts = plan_salts(flat.unionByName(hot), sample_fraction=1.0)
    assert set(salts) == {7777}
    assert 2 <= salts[7777] <= 32

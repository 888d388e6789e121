"""End-to-end image invariants (BASELINE.json input_hint): the images table
written to parquet and read back must verify decoded-pixel allclose (exact
lossless / PSNR >= 40 dB lossy) + caption equality; phash re-verifies on
lossless formats."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_to_geocore_spark.fixtures import images_df
from stac_to_geocore_spark.images.ops import decode_stats, verify_images

N = 150


def test_decode_stats_and_phash(spark):
    stats = decode_stats(images_df(spark, N, bytes_mode="full")).toPandas()
    assert len(stats) == N
    assert stats.phash_ok.all()
    assert ((stats.h.isin([32, 64, 128])) & (stats.w.isin([32, 64, 128]))).all()
    assert ((stats.mean_r >= 0) & (stats.mean_r <= 255)).all()


def test_roundtrip_through_parquet_verifies(spark, tmp_path):
    src = images_df(spark, N, bytes_mode="full")
    path = str(tmp_path / "images_tbl")
    src.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    v = verify_images(src, back).toPandas()
    assert len(v) == N
    assert v.pixels_ok.all(), v[~v.pixels_ok].head()
    assert v.caption_ok.all()
    lossy = v[v.psnr < 999.0]
    assert (lossy.psnr >= 40.0).all()


def test_verify_catches_corruption(spark):
    a = images_df(spark, 50, bytes_mode="full", seed=42)
    b = images_df(spark, 50, bytes_mode="full", seed=43)  # different pixels + captions
    v = verify_images(a, b).toPandas()
    assert not v.pixels_ok.all()
    # cluster ids can coincide across seeds (~1/12 of captions), but the bulk must differ
    assert v.caption_ok.mean() < 0.5


def test_caption_equality_through_flagship_join(spark):
    """Captions survive the encode+PIP pipeline joined back to the source."""
    from stac_to_geocore_spark.fixtures import polygons_df
    from stac_to_geocore_spark.pipeline import flagship

    imgs = images_df(spark, 500, bytes_mode="none").persist()
    out = flagship(imgs, polygons_df(spark, 16))
    joined = out.join(imgs.select("image_id", "caption"), "image_id")
    recomputed = joined.withColumn(
        "cap_ok",
        F.col("caption") == F.concat(
            F.lit("synthetic scene "),
            F.regexp_extract("image_id", r"img-0*(\d+)", 1).cast("long").cast("string"),
            F.lit(" over cluster-"),
            F.regexp_extract("caption", r"cluster-(\d+)", 1),
        ),
    )
    assert recomputed.filter(~F.col("cap_ok")).count() == 0
    imgs.unpersist()

"""The flagship north-star pipeline: H3 encode + PIP join + tile assignment.

BASELINE.json metric: "end-to-end images/sec (H3 encode + PIP join + tile
assignment) on synthetic image+caption table". One declarative plan:

  images (image_id, bytes, w, h, fmt, caption, phash, lon, lat)
    -> h3_r{res} + cell_p5 (Arrow pandas UDF, numpy kernel)
    -> s2_l{lvl}           (Arrow pandas UDF)
    -> tile z/x/y          (pure JVM column math, whole-stage codegen)
    -> cell-bucket join against broadcast polygon covers at res 5 + exact
       bbox refine (filter-refine PIP; zero shuffle on the images side)
    -> assignments (image_id, poly_id, lon, lat, h3, s2, tile_x/y, cell_p5)

Why cover at res 5 while encoding at res 7: collection polygons span
degrees, so res-5 covers stay a few hundred cells each (broadcastable at any
polygon count that fits a dim table), while the res-7/s2/tile columns are
the per-image output payload. cell_p5 doubles as the join key AND the
lineage/bucketing partition key, so the whole pipeline is scan -> map ->
broadcast-join -> filter: no shuffle of the 10^12-row side at all.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stac_to_geocore_spark.cells.tiles import tile_x_expr, tile_y_expr
from stac_to_geocore_spark.spatial.cover import DRIVER_DIM_MAX, covers_df

COVER_RES = 5


@functools.lru_cache(maxsize=16)
def _fused_cells_udf(res: int, s2_level: int, _skey=None):
    """ONE Arrow round trip and ONE lat/lon->xyz projection for all three
    cell ids (h3 at `res`, h3 at COVER_RES, s2 at `s2_level`). The separate
    h3_encode/s2_encode UDFs each redo the trig+face selection; fusing them
    cuts the python-side encode work ~2x on the flagship hot path. Cached
    per (res, level, session) — cloudpickling a pandas UDF costs driver
    time; the session key avoids a dead-JVM _judf after a restart."""
    from pyspark.sql.functions import pandas_udf

    from stac_to_geocore_spark.cells import h3x
    from stac_to_geocore_spark.cells.s2 import s2_encode_xyz_np

    @pandas_udf("h3 long, cover long, s2 long")
    def _enc(lat_s: pd.Series, lon_s: pd.Series) -> pd.DataFrame:
        lat = lat_s.to_numpy(np.float64)
        lon = lon_s.to_numpy(np.float64)
        xyz = h3x._latlon_to_xyz(lat, lon)
        h3_r, cover = h3x.h3_encode_multi_np(xyz, [res, COVER_RES])
        s2c = s2_encode_xyz_np(xyz[..., 0], xyz[..., 1], xyz[..., 2], s2_level)
        return pd.DataFrame({"h3": h3_r, "cover": cover, "s2": s2c})

    return _enc


def encode_stage(images: DataFrame, res: int = 7, s2_level: int = 12, zoom: int = 12) -> DataFrame:
    """Cell/tile encoding: one projection, no shuffle, one fused UDF."""
    from stac_to_geocore_spark.cells.h3x import _session_cache_key
    from stac_to_geocore_spark.partitioning import pack_waves

    # a narrow images scan often lands as 2-4 slot-counts' worth of small
    # splits; packing them to one wave (coalesce, no exchange) halves the
    # per-task Arrow overhead of the fused encode UDF — no-op on a big
    # many-split table (see pack_waves)
    images = pack_waves(images)
    enc = _fused_cells_udf(res, s2_level, _session_cache_key())
    cells = enc(F.col("lat"), F.col("lon")).alias("_cells")
    return images.select("image_id", "lon", "lat", cells).select(
        "image_id",
        "lon",
        "lat",
        F.col("_cells.h3").alias(f"h3_r{res}"),
        # coalesce: provably non-null join key so Catalyst's inferred
        # isnotnull filter is pruned instead of forcing a second UDF pass
        F.coalesce(F.col("_cells.cover"), F.lit(-1)).alias("cell_p5"),
        F.col("_cells.s2").alias(f"s2_l{s2_level}"),
        tile_x_expr(F.col("lon"), zoom).alias(f"tile_z{zoom}_x"),
        tile_y_expr(F.col("lat"), zoom).alias(f"tile_z{zoom}_y"),
    )


def flagship(
    images: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    s2_level: int = 12,
    zoom: int = 12,
    broadcast_covers: bool = True,
    salt_factor: int = 0,
) -> DataFrame:
    """encode -> PIP assign (broadcast cell join + refine) -> assignments.

    salt_factor > 0 switches to the salted shuffle-join path (for cover
    sides too large to broadcast with heavy cell skew).
    """
    enc = encode_stage(images, res, s2_level, zoom)
    # dim-sized polygon sets plan their covers on the driver (pure numpy, no
    # Spark job or extra python-worker round — same reasoning as the
    # reference's driver-side pagination planner); big polygon tables go
    # through the distributed covers_df path. ONE bounded limit-probe job
    # doubles as the collect (a separate count() was an extra job per call)
    driver_plan_max = DRIVER_DIM_MAX
    pdf = polygons.limit(driver_plan_max + 1).toPandas()
    if len(pdf) <= driver_plan_max:
        from stac_to_geocore_spark.spatial.cover import COVER_SCHEMA, covers_pdf

        covers = images.sparkSession.createDataFrame(
            covers_pdf(pdf, fixed_res=COVER_RES), COVER_SCHEMA
        ).withColumnRenamed("cell", "cell_p5")
    else:
        covers = covers_df(polygons, fixed_res=COVER_RES).withColumnRenamed("cell", "cell_p5")
    if broadcast_covers:
        covers = F.broadcast(covers)
    if salt_factor > 0:
        enc = enc.withColumn("salt", F.pmod(F.xxhash64("image_id"), F.lit(salt_factor)))
        covers = covers.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))))
        joined = enc.join(covers, ["cell_p5", "salt"], "inner")
    else:
        joined = enc.join(covers, "cell_p5", "inner")
    return joined.filter(
        F.col("fully_inside")
        | (
            (F.col("lon") >= F.col("west")) & (F.col("lon") <= F.col("east"))
            & (F.col("lat") >= F.col("south")) & (F.col("lat") <= F.col("north"))
        )
    ).select(
        "image_id",
        "poly_id",
        "lon",
        "lat",
        f"h3_r{res}",
        "cell_p5",
        f"s2_l{s2_level}",
        f"tile_z{zoom}_x",
        f"tile_z{zoom}_y",
    )


def materialize_assignments(
    images: DataFrame,
    polygons: DataFrame,
    path: str,
    run_id: str = "run",
    batch_size: int | None = None,
    **flagship_kwargs,
):
    """The north-star pipeline with per-partition lineage checkpointing:
    flagship -> LineageWriter partitioned by cell_p5. A killed job resumes by
    skipping committed partitions (BASELINE.json north_rule); the manifest
    carries (cell range, row count, checksum, rows/sec) per partition.
    Returns the manifest rows written this invocation."""
    from stac_to_geocore_spark.tables.lineage import LineageWriter

    out = flagship(images, polygons, **flagship_kwargs)
    # range stats use the finest cell column; partitioning uses cell_p5
    res = flagship_kwargs.get("res", 7)
    out = out.withColumn("cell", F.col(f"h3_r{res}"))
    writer = LineageWriter(path, partition_col="cell_p5")
    return writer.write(out, run_id=run_id, batch_size=batch_size)

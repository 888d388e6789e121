"""General-polygon (ring) PIP: cell-cover filter + exact ray-cast refine
(spatial/pip.refine_ring) must match brute-force numpy on non-rectangular
polygons — the path real GeoCore collection footprints would take."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from stac_to_geocore_spark.cells.h3x import h3_encode
from stac_to_geocore_spark.spatial.cover import adaptive_res, cover_bbox_np
from stac_to_geocore_spark.spatial.pip import refine_ring


def _star_ring(cx: float, cy: float, r_out: float, r_in: float, n: int = 5):
    """Non-convex star polygon (alternating outer/inner vertices)."""
    ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    rad = np.where(np.arange(2 * n) % 2 == 0, r_out, r_in)
    return cx + rad * np.cos(ang), cy + rad * np.sin(ang)


def _brute_pip(px, py, rx, ry):
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    out = np.zeros(len(px), dtype=bool)
    for i in range(len(px)):
        crosses = ((y1 > py[i]) != (y2 > py[i])) & (
            px[i] < (x2 - x1) * (py[i] - y1) / (y2 - y1) + x1
        )
        out[i] = crosses.sum() % 2 == 1
    return out


def test_ring_refine_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    rx, ry = _star_ring(-95.0, 55.0, 3.0, 1.2)
    # candidate points around the star's bbox
    px = rng.uniform(-99, -91, 3000)
    py = rng.uniform(51, 59, 3000)
    want = _brute_pip(px, py, rx, ry)

    # filter: cover of the ring's bbox; refine: exact ray cast
    west, east, south, north = rx.min(), rx.max(), ry.min(), ry.max()
    res = adaptive_res(west, south, east, north)
    cells, _ = cover_bbox_np(west, south, east, north, res)
    pdf = pd.DataFrame({"pid": np.arange(3000), "lon": px, "lat": py})
    df = (
        spark.createDataFrame(pdf)
        .withColumn("cell", h3_encode(F.col("lat"), F.col("lon"), res))
        .withColumn("ring_lon", F.array(*[F.lit(float(v)) for v in rx]))
        .withColumn("ring_lat", F.array(*[F.lit(float(v)) for v in ry]))
    )
    cells_df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
    inside = (
        df.join(F.broadcast(cells_df), "cell")  # cover filter
        .filter(refine_ring(F.lit("star"), F.col("lon"), F.col("lat"), F.col("ring_lon"), F.col("ring_lat")))
        .select("pid")
        .toPandas()["pid"]
        .to_numpy()
    )
    got = np.zeros(3000, dtype=bool)
    got[inside] = True
    assert (got == want).all(), f"{(got != want).sum()} disagreements"
    assert want.sum() > 100  # the test actually exercises inside points

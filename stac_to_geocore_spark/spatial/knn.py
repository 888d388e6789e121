"""kNN via cell-ring expansion: nearest images to query centroids.

BASELINE.json: "answers kNN queries (nearest-image-to-centroid) with
cell-ring expansion". Queries (collection centroids) are few; points are the
10^12-row images table. The plan per iteration is:

  candidate cells = grid-disk(query_cell, r)          [driver-side numpy, tiny]
  candidates      = points ⋈ broadcast(cells)          [scan + broadcast join]
  top-k           = Window.partitionBy(query).orderBy(dist) row_number <= k

The ring radius doubles until every query's k-th best candidate lies within
the ring's guaranteed-coverage radius — at that point the candidate set
provably contains the true top-k, so the final window is EXACT (verified
against brute force and a DuckDB oracle in tests).

At warehouse scale the points table is stored bucketed/partitioned by cell
prefix (tables/lineage.py writes partitionBy(cell_p5)), so the broadcast
cell-set join prunes file reads instead of scanning — the same plan, but the
scan cost drops to the rings' data only.

Distance metric: squared equirectangular "scaled degrees"
(dx = dlon * cos(mid_lat), dy = dlat) — monotone in true distance at these
extents, and exactly reproducible in ANSI SQL for the oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stac_to_geocore_spark.cells import h3x

DEG = 180.0 / math.pi
_DISTORT = 1.7


def _guarantee_deg(r: int, res: int) -> float:
    """All points within this angular distance (degrees) of a query are
    guaranteed to fall in grid-disk(query_cell, r)."""
    s = h3x.res_spacing(res)
    plane = s * (r * math.sqrt(3.0) / 2.0 - 2.0 / math.sqrt(3.0))
    return max(0.0, plane * DEG / _DISTORT) * 0.9  # 10% slack for metric skew


def knn_join(
    points: DataFrame,
    queries: pd.DataFrame,
    k: int,
    point_id: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    res: int = 7,
    initial_r: int = 2,
    max_r: int = 256,
) -> DataFrame:
    """Exact k nearest points for each query row.

    queries: pandas DataFrame (query_id, lon, lat) — small by contract.
    Returns (query_id, point_id, rank, dist2) with rank 1..k
    (dist2 in squared scaled degrees, rounded to 9 dp for stable hashing).
    """
    spark = points.sparkSession
    qlon = queries["lon"].to_numpy(np.float64)
    qlat = queries["lat"].to_numpy(np.float64)
    qids = queries["query_id"].tolist()
    qcells = h3x.h3_encode_np(qlat, qlon, res)

    pts = points.select(
        F.col(point_id).alias("point_id"), F.col(lon).alias("p_lon"), F.col(lat).alias("p_lat")
    ).withColumn("cell", h3x.h3_encode(F.col("p_lat"), F.col("p_lon"), res))
    pts = pts.persist()
    try:
        r = initial_r
        while True:
            disks = h3x.h3_kring_np(qcells, r)  # (Q, m)
            cell_rows = [
                (qids[i], float(qlon[i]), float(qlat[i]), int(c))
                for i in range(len(qids))
                for c in np.unique(disks[i])
            ]
            cells_df = spark.createDataFrame(cell_rows, "query_id string, q_lon double, q_lat double, cell long")
            mid = F.radians((F.col("q_lat") + F.col("p_lat")) / 2.0)
            dx = (F.col("q_lon") - F.col("p_lon")) * F.cos(mid)
            dy = F.col("q_lat") - F.col("p_lat")
            cand = (
                pts.join(F.broadcast(cells_df), "cell")
                .withColumn("dist2", dx * dx + dy * dy)
            )
            w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("point_id").asc())
            topk = (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "point_id", "rank", "dist2")
            )
            stats = (
                topk.groupBy("query_id")
                .agg(F.count("*").alias("cnt"), F.max("dist2").alias("worst"))
                .collect()
            )
            by_q = {s["query_id"]: s for s in stats}
            g = _guarantee_deg(r, res)
            satisfied = all(
                q in by_q and by_q[q]["cnt"] >= k and math.sqrt(by_q[q]["worst"]) <= g
                for q in qids
            )
            if satisfied or r >= max_r:
                return topk.withColumn("dist2", F.round(F.col("dist2"), 9))
            r = min(max_r, r * 2)
    finally:
        pts.unpersist()

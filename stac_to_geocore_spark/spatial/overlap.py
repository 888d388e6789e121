"""Region-region spatial join: bbox overlap via shared cell covers.

pip.py joins points to regions; this joins REGIONS to REGIONS (collection
footprints vs AOIs, tiles vs collections, ...). Same filter-refine shape:

  covers(A, res) equi-join covers(B, res) on cell  ->  candidate pairs
  refine: exact bbox-intersection predicate (pure JVM column math)

Completeness holds because both sides cover at the SAME res and
cover_bbox_np is superset-guaranteed: intersecting bboxes share a point,
that point encodes to one cell at res r, and that cell is in both covers —
so the equi-join can never miss an intersecting pair (false candidates are
removed by the exact refine).

Scale shape: each side shuffles (or broadcasts) only (id, cell) pairs; the
join key is the natural bucketing column, so two pre-bucketed region tables
co-locate and the join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stac_to_geocore_spark.spatial.cover import COVER_SCHEMA, adaptive_res, covers_pdf


def _common_res(pdf_a, pdf_b, res_min: int, res_max: int, max_cells: int) -> int:
    """One res for BOTH sides (the completeness argument needs it): the
    coarsest adaptive res over all bboxes, so no polygon's cover exceeds
    max_cells."""
    res = res_max
    for pdf in (pdf_a, pdf_b):
        for r in pdf.itertuples(index=False):
            res = min(res, adaptive_res(r.west, r.south, r.east, r.north,
                                         res_min, res_max, max_cells))
    return max(res, res_min)


def bbox_overlap_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res_min: int = 3,
    res_max: int = 9,
    max_cells: int = 2048,
    fixed_res: int | None = None,
) -> DataFrame:
    """All (id_a, id_b) pairs whose bboxes intersect (closed-edge semantics).

    Both inputs: (poly_id, west, south, east, north). Dim-sized sets plan
    covers driver-side (pure numpy, no extra Spark jobs), mirroring
    pip_join; bigger tables should pre-bucket on the cover cell and use the
    distributed covers_df path."""
    spark = polys_a.sparkSession
    pdf_a, pdf_b = polys_a.toPandas(), polys_b.toPandas()
    res = fixed_res if fixed_res is not None else _common_res(pdf_a, pdf_b, res_min, res_max, max_cells)

    cov_a = spark.createDataFrame(covers_pdf(pdf_a, fixed_res=res), COVER_SCHEMA).select(
        F.col("poly_id").alias("id_a"), "cell",
        F.col("west").alias("wa"), F.col("south").alias("sa"),
        F.col("east").alias("ea"), F.col("north").alias("na"),
    )
    cov_b = spark.createDataFrame(covers_pdf(pdf_b, fixed_res=res), COVER_SCHEMA).select(
        F.col("poly_id").alias("id_b"), "cell",
        F.col("west").alias("wb"), F.col("south").alias("sb"),
        F.col("east").alias("eb"), F.col("north").alias("nb"),
    )
    return (
        cov_a.join(F.broadcast(cov_b), "cell")
        .filter(
            (F.col("wa") <= F.col("eb")) & (F.col("ea") >= F.col("wb"))
            & (F.col("sa") <= F.col("nb")) & (F.col("na") >= F.col("sb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )

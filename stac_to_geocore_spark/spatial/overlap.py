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

Scale shape: each side shuffles (or broadcasts) only (id, cell, bbox) rows;
the join key is the natural bucketing column, so two pre-bucketed region
tables co-locate and the join is shuffle-free. Sides are probed with ONE
`limit(driver_plan_max+1)` job each: a dim-sized side plans its covers
driver-side (pure numpy, no extra jobs) and broadcasts; a side above the
threshold plans covers DISTRIBUTED (covers_df, mapInPandas) and equi-joins
cell-bucketed — nothing above the threshold is ever collected to the
driver (round 2 unconditionally toPandas()'d BOTH sides).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from stac_to_geocore_spark.spatial.cover import (
    COVER_SCHEMA,
    DRIVER_DIM_MAX,
    adaptive_res,
    covers_df,
    covers_pdf,
)


def _min_res_pdf(pdf, res_min: int, res_max: int, max_cells: int) -> int:
    res = res_max
    for r in pdf.itertuples(index=False):
        res = min(res, adaptive_res(r.west, r.south, r.east, r.north,
                                    res_min, res_max, max_cells))
    return res


def _min_res_distributed(df: DataFrame, res_min: int, res_max: int, max_cells: int) -> int:
    """Coarsest adaptive res over a big region table: one narrow agg (the
    per-row res is computed in an Arrow batch, only the min crosses the
    wire)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(IntegerType())
    def _res(w: pd.Series, s: pd.Series, e: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series([
            adaptive_res(float(wi), float(si), float(ei), float(ni),
                         res_min, res_max, max_cells)
            for wi, si, ei, ni in zip(w, s, e, n)
        ])

    row = df.select(
        F.min(_res(F.col("west"), F.col("south"), F.col("east"), F.col("north"))).alias("r")
    ).collect()[0]
    return int(row["r"]) if row["r"] is not None else res_max


def bbox_overlap_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res_min: int = 3,
    res_max: int = 9,
    max_cells: int = 2048,
    fixed_res: int | None = None,
    driver_plan_max: int = DRIVER_DIM_MAX,
) -> DataFrame:
    """All (id_a, id_b) pairs whose bboxes intersect (closed-edge semantics).

    Both inputs: (poly_id, west, south, east, north). Sides at or below
    driver_plan_max rows plan covers driver-side and broadcast; bigger
    sides plan covers distributed (covers_df) and equi-join on the cell —
    the cell is the natural bucketing column, so two pre-bucketed region
    tables co-locate and the join is shuffle-free."""
    spark = polys_a.sparkSession
    pdf_a = polys_a.limit(driver_plan_max + 1).toPandas()
    pdf_b = polys_b.limit(driver_plan_max + 1).toPandas()
    a_small = len(pdf_a) <= driver_plan_max
    b_small = len(pdf_b) <= driver_plan_max

    if fixed_res is not None:
        res = fixed_res
    else:
        # one res for BOTH sides (the completeness argument needs it): the
        # coarsest adaptive res over all bboxes, so no cover exceeds max_cells
        res = res_max
        for pdf, small, df in ((pdf_a, a_small, polys_a), (pdf_b, b_small, polys_b)):
            res = min(
                res,
                _min_res_pdf(pdf, res_min, res_max, max_cells)
                if small
                else _min_res_distributed(df, res_min, res_max, max_cells),
            )
        res = max(res, res_min)

    def side(df: DataFrame, pdf, small: bool, tag: str) -> DataFrame:
        cov = (
            spark.createDataFrame(covers_pdf(pdf, fixed_res=res), COVER_SCHEMA)
            if small
            else covers_df(df, fixed_res=res)
        )
        return cov.select(
            F.col("poly_id").alias(f"id_{tag}"), "cell",
            F.col("west").alias(f"w{tag}"), F.col("south").alias(f"s{tag}"),
            F.col("east").alias(f"e{tag}"), F.col("north").alias(f"n{tag}"),
        )

    cov_a = side(polys_a, pdf_a, a_small, "a")
    cov_b = side(polys_b, pdf_b, b_small, "b")
    if b_small:
        cov_b = F.broadcast(cov_b)
    elif a_small:
        cov_a = F.broadcast(cov_a)
    else:
        # BOTH sides big: pin sort-merge on the cell key. Without the hint,
        # AQE's runtime stats can flip a multi-million-row cover side to a
        # broadcast build and OOM the driver (observed in a vanilla 1g
        # session at sf0.01) — and at 100 TB a broadcast of either side is
        # never the right plan; the shuffle-on-cell co-location is.
        cov_a = cov_a.hint("merge")
    return (
        cov_a.join(cov_b, "cell")
        .filter(
            (F.col("wa") <= F.col("eb")) & (F.col("ea") >= F.col("wb"))
            & (F.col("sa") <= F.col("nb")) & (F.col("na") >= F.col("sb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from stac_to_geocore_spark.spatial.cover import (
    COVER_EXPANDED_SCHEMA,
    COVER_SCHEMA,
    DRIVER_DIM_MAX,
    adaptive_res,
    cell_area_rad2,
    covers_df,
    covers_df_compact_expanded,
    covers_pdf,
)


def _min_res_pdf(pdf, res_min: int, res_max: int, max_cells: int) -> int:
    res = res_max
    for r in pdf.itertuples(index=False):
        res = min(res, adaptive_res(r.west, r.south, r.east, r.north,
                                    res_min, res_max, max_cells))
    return res


def _area_rad2_col():
    # built lazily, NOT at module import: executors import this module when
    # unpickling the _res UDF, and Column construction asserts an active
    # SparkContext (absent on workers)
    return (
        F.radians(F.col("east") - F.col("west"))
        * F.radians(F.col("north") - F.col("south"))
        * F.cos(F.radians((F.col("south") + F.col("north")) / F.lit(2.0)))
    )


def _res_stats_distributed(
    df: DataFrame, res_min: int, res_max: int, max_cells: int,
    with_median: bool = False,
) -> tuple[int, float, float]:
    """(coarsest adaptive res, mean bbox area rad^2, median bbox area rad^2)
    over a big region table in ONE narrow agg/scan: the per-row res is
    computed in an Arrow batch, the areas in JVM column math; only three
    scalars cross the wire. The single-res join sizes cells to the MEAN box;
    the compact join uses the MEDIAN (robust to the large-box tail that the
    compaction exists to absorb) — the approx-percentile digest is built
    only when with_median is set, so the single-res path's stats scan pays
    nothing for a statistic it discards (median is 0.0 otherwise)."""
    from pyspark.sql.functions import pandas_udf

    # adaptive_res, vectorized: res r fits iff bbox_area <= max_cells *
    # cell_area(r); the threshold grows monotonically as r coarsens, so the
    # satisfied set is a suffix [res_min..r*] and r* = res_min - 1 + count.
    thresh = np.array([
        max_cells * cell_area_rad2(r) for r in range(res_min, res_max + 1)
    ])

    @pandas_udf(IntegerType())
    def _res(w: pd.Series, s: pd.Series, e: pd.Series, n: pd.Series) -> pd.Series:
        wv, sv, ev, nv = (x.to_numpy(np.float64) for x in (w, s, e, n))
        areas = np.maximum(
            1e-12,
            np.radians(ev - wv) * np.radians(nv - sv)
            * np.cos(np.radians((sv + nv) / 2.0)),
        )
        fits = areas[:, None] <= thresh[None, :]
        return pd.Series((res_min - 1 + fits.sum(axis=1)).clip(res_min).astype("int32"))

    aggs = [
        F.min(_res(F.col("west"), F.col("south"), F.col("east"), F.col("north"))).alias("r"),
        F.avg(_area_rad2_col()).alias("a"),
    ]
    if with_median:
        aggs.append(F.percentile_approx(_area_rad2_col(), 0.5, 10000).alias("m"))
    row = df.select(*aggs).collect()[0]
    return (
        int(row["r"]) if row["r"] is not None else res_max,
        float(row["a"]) if row["a"] is not None else 0.0,
        float(row["m"]) if with_median and row["m"] is not None else 0.0,
    )


def _res_stats_pdf(pdf, res_min: int, res_max: int, max_cells: int) -> tuple[int, float, float]:
    if len(pdf) == 0:
        return res_max, 0.0, 0.0
    import numpy as np

    areas = (
        np.radians(pdf["east"] - pdf["west"])
        * np.radians(pdf["north"] - pdf["south"])
        * np.cos(np.radians((pdf["south"] + pdf["north"]) / 2.0))
    )
    return (_min_res_pdf(pdf, res_min, res_max, max_cells),
            float(np.mean(areas)), float(np.median(areas)))


def _res_for_mean_area(mean_area_rad2: float, res_min: int, res_max: int,
                       target_cells: float) -> int:
    """Finest res whose cell area keeps the MEAN box's cover near
    target_cells. adaptive_res caps the WORST box (max_cells protects the
    cover explosion of a huge polygon); this sizes the TYPICAL box — for a
    region-region join the cover row count is what shuffles, and a box much
    smaller than max_cells' worth of cells gains nothing from fine cells
    (measured: 0.1-deg boxes at res 9 cover ~430 cells each vs ~4 at the
    mean-sized res — a 100x shuffle-volume difference for the same exact
    result, since the refine predicate removes the extra coarse-res
    candidates either way)."""
    for res in range(res_max, res_min - 1, -1):
        if mean_area_rad2 / cell_area_rad2(res) <= target_cells:
            return res
    return res_min


def bbox_overlap_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res_min: int = 3,
    res_max: int = 9,
    max_cells: int = 2048,
    fixed_res: int | None = None,
    driver_plan_max: int = DRIVER_DIM_MAX,
    target_cells_per_box: float = 4.0,
    salt_hot_cells: bool = True,
    salt_sample_fraction: float = 0.05,
    salt_hot_multiplier: float = 8.0,
) -> DataFrame:
    """All (id_a, id_b) pairs whose bboxes intersect (closed-edge semantics).

    Both inputs: (poly_id, west, south, east, north). Sides at or below
    driver_plan_max rows plan covers driver-side and broadcast; bigger
    sides plan covers distributed (covers_df) and equi-join on the cell —
    the cell is the natural bucketing column, so two pre-bucketed region
    tables co-locate and the join is shuffle-free.

    Both-big skew (salt_hot_cells): a hot cell — a dense urban/coastal cell
    with many cover rows on BOTH sides — makes the cell equi-join quadratic
    in that one key on one reducer. A sampled cover histogram (5% of side
    A's polygons, so ~5% of one cover pass) finds cells whose count exceeds
    salt_hot_multiplier x the mean; only those get salted (side A hashed by
    poly_id, side B's hot rows replicated per salt), splitting each hot
    cell across its salt-factor reducers — replication cost proportional to
    the skew, not the table (spatial/skew.py, the machinery pip_salted
    uses). AQE's skew-join split remains the backstop for skew the sample
    misses. When the histogram finds NO hot cells the join stays symmetric,
    and a self-join (polys_a is polys_b) then builds both sides from ONE
    cover plan whose shuffles Catalyst dedups via ReusedExchange: covers
    are computed and exchanged once, not twice."""
    spark = polys_a.sparkSession
    self_join = polys_a is polys_b
    pdf_a = polys_a.limit(driver_plan_max + 1).toPandas()
    pdf_b = pdf_a if self_join else polys_b.limit(driver_plan_max + 1).toPandas()
    a_small = len(pdf_a) <= driver_plan_max
    b_small = len(pdf_b) <= driver_plan_max

    if fixed_res is not None:
        res = fixed_res
    else:
        # one res for BOTH sides (the completeness argument needs it), from
        # two bounds: (1) cap_res — the coarsest adaptive res over all
        # bboxes, so no single cover exceeds max_cells; (2) mean_res — the
        # res sized to the MEAN box (~target_cells_per_box cells each),
        # because total cover rows = shuffle volume and the finest-that-
        # fits choice inflates tiny-box covers ~100x for zero extra
        # selectivity (the exact refine runs on candidates either way).
        # Take the coarser of the two: the cap can only loosen when cells
        # grow, so max_cells still holds. A self-join measures its one
        # input once, not per side.
        sides = ((pdf_a, a_small, polys_a),) if self_join else (
            (pdf_a, a_small, polys_a), (pdf_b, b_small, polys_b))
        cap_res, mean_area = res_max, 0.0
        for pdf, small, df in sides:
            r, a, _med = (
                _res_stats_pdf(pdf, res_min, res_max, max_cells)
                if small
                else _res_stats_distributed(df, res_min, res_max, max_cells)
            )
            cap_res = min(cap_res, r)
            mean_area = max(mean_area, a)
        mean_res = _res_for_mean_area(mean_area, res_min, res_max, target_cells_per_box)
        res = max(res_min, min(cap_res, mean_res))

    def raw_cover(df: DataFrame, pdf, small: bool) -> DataFrame:
        cov = (
            spark.createDataFrame(covers_pdf(pdf, fixed_res=res), COVER_SCHEMA)
            if small
            else covers_df(df, fixed_res=res)
        )
        return cov.select("poly_id", "cell", "west", "south", "east", "north")

    def tagged(cov: DataFrame, tag: str) -> DataFrame:
        return cov.select(
            F.col("poly_id").alias(f"id_{tag}"), "cell",
            F.col("west").alias(f"w{tag}"), F.col("south").alias(f"s{tag}"),
            F.col("east").alias(f"e{tag}"), F.col("north").alias(f"n{tag}"),
        )

    raw_a = raw_cover(polys_a, pdf_a, a_small)
    raw_b = raw_a if self_join else raw_cover(polys_b, pdf_b, b_small)

    refine = (
        (F.col("wa") <= F.col("eb")) & (F.col("ea") >= F.col("wb"))
        & (F.col("sa") <= F.col("nb")) & (F.col("na") >= F.col("sb"))
    )

    if not (a_small or b_small):
        # BOTH sides big. Sort-merge is pinned on the cell key in every
        # branch below: without the hint, AQE's runtime stats can flip a
        # multi-million-row cover side to a broadcast build and OOM the
        # driver (observed in a vanilla 1g session at sf0.01) — and at
        # 100 TB a broadcast of either side is never the right plan; the
        # shuffle-on-cell co-location is.
        salts: dict[int, int] = {}
        if salt_hot_cells:
            from stac_to_geocore_spark.spatial.skew import plan_salts

            # histogram over the covers of a polygon SAMPLE (sampling before
            # cover generation: ~5% of one cover pass, not a full extra
            # one); hotness is count/mean, invariant to the sampling rate
            hist_src = covers_df(
                polys_a.sample(fraction=salt_sample_fraction, seed=42),
                fixed_res=res,
            )
            salts = plan_salts(hist_src, sample_fraction=1.0,
                               hot_multiplier=salt_hot_multiplier)
        if salts:
            # the one salted-equi-join implementation (spatial/skew.py):
            # side A plays the hashed "points" role, side B replicates
            from stac_to_geocore_spark.spatial.skew import salted_cell_join

            joined = salted_cell_join(
                tagged(raw_a, "a").hint("merge"), tagged(raw_b, "b"),
                salts, point_id="id_a",
            )
        elif self_join:
            # aliased self-join over the ONE raw cover: both SMJ inputs
            # exchange the identical subtree, so Catalyst's ReuseExchange
            # computes + shuffles the covers once (verified: the final AQE
            # plan shows one MapInPandas and a ReusedExchange second side)
            lhs, rhs = raw_a.alias("A"), raw_a.alias("B")
            return (
                lhs.hint("merge").join(rhs, F.col("A.cell") == F.col("B.cell"))
                .filter(
                    (F.col("A.west") <= F.col("B.east"))
                    & (F.col("A.east") >= F.col("B.west"))
                    & (F.col("A.south") <= F.col("B.north"))
                    & (F.col("A.north") >= F.col("B.south"))
                )
                .select(F.col("A.poly_id").alias("id_a"),
                        F.col("B.poly_id").alias("id_b"))
                .distinct()
            )
        else:
            joined = tagged(raw_a, "a").hint("merge").join(tagged(raw_b, "b"), "cell")
    else:
        cov_a = tagged(raw_a, "a")
        cov_b = tagged(raw_b, "b")
        if b_small:
            cov_b = F.broadcast(cov_b)
        else:
            cov_a = F.broadcast(cov_a)
        joined = cov_a.join(cov_b, "cell")

    return joined.filter(refine).select("id_a", "id_b").distinct()


def bbox_overlap_join_compact(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res_min: int = 3,
    res_max: int = 9,
    fine_res: int | None = None,
    collapse_levels: int = 3,
    max_fine_cells: int = 262144,
    target_cells_per_box: float = 4.0,
    driver_plan_max: int = DRIVER_DIM_MAX,
) -> DataFrame:
    """Multi-res COMPACT variant of bbox_overlap_join for mixed-size region
    tables: identical output, different candidate-generation trade.

    The single-res join picks ONE res for both sides, capped by the
    LARGEST box — a table mixing continent-scale AOIs with item-footprint
    boxes is forced coarse, and dense tiny boxes then share fat cells
    (candidate pairs grow quadratically per cell). Here the fine res is
    sized to the MEDIAN box (robust to the AOI tail); each polygon's fine
    cover is COMPACTED (interior 7-child sets collapse to ancestors,
    bounded at fine_res - collapse_levels) and pre-expanded to
    (lvl, ancestor, native-flag) join rows in one mapInPandas
    (covers_df_compact_expanded — completeness + the native-side condition
    that prevents a coarse-level quadratic are argued there). One
    sort-merge equi-join on (lvl, key) with at-least-one-side-native, the
    exact refine, then distinct.

    MEASURED regime guidance (sf-like fixtures, self-join, local[8]):
    output matched bbox_overlap_join exactly on every fixture (tiny-
    uniform, mixed 25x, AOI 12-16 deg sparse AND dense). Candidates:
    2.1x FEWER than single-res on the dense+AOI fixture (42.6M vs 90.6M).
    Wall time with this CHEAP 4-compare bbox refine: single-res WON every
    fixture (its coarse plan shuffles fewer, fatter cells and the refine
    absorbs the extra candidates at JVM speed) — so for plain bbox
    overlap, prefer bbox_overlap_join. This operator is the right shape
    when the refine is EXPENSIVE (exact polygon-polygon intersection in a
    Python kernel at ~us/candidate): there the 2x candidate reduction
    dominates, and the same (lvl, key, nat) join machinery carries any
    refine predicate.
    """
    from stac_to_geocore_spark.cells.h3x import MAX_RES
    from stac_to_geocore_spark.spatial.cover import covers_pdf_compact_expanded

    if collapse_levels < 0:
        raise ValueError(f"collapse_levels must be >= 0, got {collapse_levels}")
    if fine_res is not None and not (0 <= fine_res <= MAX_RES):
        raise ValueError(f"fine_res must be in [0, {MAX_RES}], got {fine_res}")
    spark = polys_a.sparkSession
    self_join = polys_a is polys_b
    pdf_a = polys_a.limit(driver_plan_max + 1).toPandas()
    pdf_b = pdf_a if self_join else polys_b.limit(driver_plan_max + 1).toPandas()
    a_small = len(pdf_a) <= driver_plan_max
    b_small = len(pdf_b) <= driver_plan_max

    if fine_res is None:
        # mean-box res (the shuffle-volume knob) bounded by the coarsest
        # res at which the WORST box's TRANSIENT fine cover (materialized
        # per-polygon inside the cover kernel, pre-compaction) stays under
        # max_fine_cells — a much looser cap than the single-res join's
        # max_cells because compaction shrinks it before anything shuffles
        sides = ((pdf_a, a_small, polys_a),) if self_join else (
            (pdf_a, a_small, polys_a), (pdf_b, b_small, polys_b))
        cap_res, med_area = res_max, 0.0
        for pdf, small, df in sides:
            r, _a, med = (
                _res_stats_pdf(pdf, res_min, res_max, max_fine_cells)
                if small
                else _res_stats_distributed(df, res_min, res_max, max_fine_cells, with_median=True)
            )
            cap_res = min(cap_res, r)
            med_area = max(med_area, med)
        # MEDIAN box, not mean: a mixed table's mean area is dominated by
        # exactly the large-box tail compaction absorbs — sizing to the
        # median keeps cells matched to the typical (small) box, which is
        # where candidate selectivity is won
        med_res = _res_for_mean_area(med_area, res_min, res_max, target_cells_per_box)
        fine_res = max(res_min, min(cap_res, med_res))
    levels = list(range(max(0, fine_res - collapse_levels), fine_res + 1))

    def side_exp(df: DataFrame, pdf, small: bool) -> DataFrame:
        # dim-sized sides plan driver-side (pure numpy, zero Spark jobs) and
        # broadcast — the same contract as bbox_overlap_join's covers_pdf path
        if small:
            return spark.createDataFrame(
                covers_pdf_compact_expanded(pdf, fine_res, levels),
                COVER_EXPANDED_SCHEMA,
            )
        return covers_df_compact_expanded(df, fine_res, levels)

    exp_a = side_exp(polys_a, pdf_a, a_small)
    if self_join:
        lhs, rhs = exp_a.alias("A"), exp_a.alias("B")  # ReusedExchange (see bbox_overlap_join)
        if a_small:
            rhs = F.broadcast(rhs)
    else:
        lhs = exp_a.alias("A")
        rhs = side_exp(polys_b, pdf_b, b_small).alias("B")
        if b_small:
            rhs = F.broadcast(rhs)
        elif a_small:
            lhs = F.broadcast(lhs)
    if not (a_small or b_small):
        lhs = lhs.hint("merge")  # same AQE-broadcast-OOM guard as bbox_overlap_join
    return (
        lhs.join(rhs, (F.col("A.lvl") == F.col("B.lvl")) & (F.col("A.key") == F.col("B.key"))
                 & (F.col("A.nat") | F.col("B.nat")))
        .filter(
            (F.col("A.west") <= F.col("B.east"))
            & (F.col("A.east") >= F.col("B.west"))
            & (F.col("A.south") <= F.col("B.north"))
            & (F.col("A.north") >= F.col("B.south"))
        )
        .select(F.col("A.poly_id").alias("id_a"), F.col("B.poly_id").alias("id_b"))
        .distinct()
    )

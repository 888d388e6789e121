"""Spatial operators vs brute-force numpy oracles (SURVEY.md §5.2 item 3):
PIP join and kNN must match O(n*m) exact computation EXACTLY."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_to_geocore_spark.fixtures import POLYGONS_SCHEMA, gen_polygons_pdf, image_centroids
from stac_to_geocore_spark.spatial.cover import adaptive_res, cover_bbox_np
from stac_to_geocore_spark.cells import h3x
from stac_to_geocore_spark.spatial.knn import knn_join
from stac_to_geocore_spark.spatial.pip import pip_join

N_PTS = 4000
RNG = np.random.default_rng(99)


@pytest.fixture(scope="module")
def points_pdf():
    lon, lat = image_centroids(np.arange(N_PTS), seed=7)
    return pd.DataFrame({"image_id": [f"p{i:06d}" for i in range(N_PTS)], "lon": lon, "lat": lat})


@pytest.fixture(scope="module")
def polys_pdf():
    return gen_polygons_pdf(30, seed=7)


def _brute_pairs(points_pdf, polys_pdf) -> set:
    out = set()
    for p in polys_pdf.itertuples(index=False):
        m = (
            (points_pdf.lon >= p.west) & (points_pdf.lon <= p.east)
            & (points_pdf.lat >= p.south) & (points_pdf.lat <= p.north)
        )
        out |= {(pid, p.poly_id) for pid in points_pdf.image_id[m]}
    return out


def test_cover_superset_random_bboxes():
    for _ in range(15):
        w = RNG.uniform(-140, -60); s = RNG.uniform(42, 80)
        e = w + RNG.uniform(0.05, 5); n = s + RNG.uniform(0.05, 5)
        res = adaptive_res(w, s, e, n)
        assert 5 <= res <= 9
        cells, full = cover_bbox_np(w, s, e, n, res)
        plon = RNG.uniform(w, e, 2000); plat = RNG.uniform(s, n, 2000)
        assert np.isin(h3x.h3_encode_np(plat, plon, res), cells).all()
        assert full.sum() <= len(cells)


def test_pip_join_broadcast_exact(spark, points_pdf, polys_pdf):
    pts = spark.createDataFrame(points_pdf)
    polys = spark.createDataFrame(polys_pdf, POLYGONS_SCHEMA)
    got = {(r.image_id, r.poly_id) for r in pip_join(pts, polys, broadcast_covers=True).collect()}
    assert got == _brute_pairs(points_pdf, polys_pdf)


def test_pip_join_salted_shuffle_exact(spark, points_pdf, polys_pdf):
    pts = spark.createDataFrame(points_pdf)
    polys = spark.createDataFrame(polys_pdf, POLYGONS_SCHEMA)
    got = {
        (r.image_id, r.poly_id)
        for r in pip_join(pts, polys, broadcast_covers=False, salt_factor=4).collect()
    }
    assert got == _brute_pairs(points_pdf, polys_pdf)


def test_pip_join_no_polygons(spark, points_pdf):
    pts = spark.createDataFrame(points_pdf)
    empty = spark.createDataFrame([], POLYGONS_SCHEMA)
    assert pip_join(pts, empty).count() == 0


def test_knn_exact_vs_brute_force(spark, points_pdf):
    queries = pd.DataFrame(
        {"query_id": [f"q{i}" for i in range(5)],
         "lon": [-118.3, -92.7, -68.6, -135.0, -77.7],
         "lat": [54.3, 63.4, 49.3, 75.5, 70.3]}
    )
    k = 7
    pts = spark.createDataFrame(points_pdf)
    got = knn_join(pts, queries, k=k).toPandas()
    assert len(got) == 5 * k
    for q in queries.itertuples(index=False):
        dx = (q.lon - points_pdf.lon) * np.cos(np.radians((q.lat + points_pdf.lat) / 2))
        dy = q.lat - points_pdf.lat
        d2 = (dx * dx + dy * dy).to_numpy()
        order = np.lexsort((points_pdf.image_id.to_numpy(), d2))
        want = list(points_pdf.image_id.to_numpy()[order[:k]])
        mine = got[got.query_id == q.query_id].sort_values("rank")["point_id"].tolist()
        assert mine == want, q.query_id


def test_flagship_matches_brute_force(spark, points_pdf, polys_pdf):
    from stac_to_geocore_spark.cells.s2 import s2_encode_np
    from stac_to_geocore_spark.cells.tiles import tile_xy_np
    from stac_to_geocore_spark.pipeline import flagship

    polys = spark.createDataFrame(polys_pdf, POLYGONS_SCHEMA)
    pts = spark.createDataFrame(points_pdf)
    out = flagship(pts, polys).toPandas()
    assert {(r.image_id, r.poly_id) for r in out.itertuples(index=False)} == _brute_pairs(points_pdf, polys_pdf)
    # encoded columns match the numpy twins row-by-row
    ex, ey = tile_xy_np(out.lon.to_numpy(), out.lat.to_numpy(), 12)
    assert (out.tile_z12_x.to_numpy() == ex).all() and (out.tile_z12_y.to_numpy() == ey).all()
    assert (out.h3_r7.to_numpy() == h3x.h3_encode_np(out.lat.to_numpy(), out.lon.to_numpy(), 7)).all()
    assert (out.cell_p5.to_numpy() == h3x.h3_encode_np(out.lat.to_numpy(), out.lon.to_numpy(), 5)).all()
    assert (out.s2_l12.to_numpy() == s2_encode_np(out.lat.to_numpy(), out.lon.to_numpy(), 12)).all()


def test_flagship_salted_path_same_result(spark, points_pdf, polys_pdf):
    from stac_to_geocore_spark.pipeline import flagship

    polys = spark.createDataFrame(polys_pdf, POLYGONS_SCHEMA)
    pts = spark.createDataFrame(points_pdf)
    plain = {(r.image_id, r.poly_id) for r in flagship(pts, polys).collect()}
    salted = {
        (r.image_id, r.poly_id)
        for r in flagship(pts, polys, broadcast_covers=False, salt_factor=8).collect()
    }
    assert plain == salted


def test_bbox_overlap_join_vs_brute_force(spark):
    """Region-region bbox overlap: cover equi-join + refine must equal the
    O(n*m) predicate — including containment, edge-touching, and disjoint."""
    import itertools

    from stac_to_geocore_spark.spatial.overlap import bbox_overlap_join

    rows = [
        ("p0", -100.0, 40.0, -90.0, 50.0),
        ("p1", -95.0, 45.0, -85.0, 55.0),    # overlaps p0
        ("p2", -98.0, 42.0, -96.0, 44.0),    # contained in p0
        ("p3", -90.0, 50.0, -80.0, 60.0),    # touches p0 at a corner
        ("p4", -60.0, 40.0, -50.0, 50.0),    # disjoint
        ("p5", -120.0, 70.0, -60.0, 80.0),   # wide northern strip
    ]
    schema = "poly_id string, west double, south double, east double, north double"
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.id_a, r.id_b)
        for r in bbox_overlap_join(df, df).filter("id_a < id_b").collect()
    }
    want = set()
    for a, b in itertools.combinations(rows, 2):
        if a[1] <= b[3] and a[3] >= b[1] and a[2] <= b[4] and a[4] >= b[2]:
            want.add((a[0], b[0]))
    assert got == want and ("p0", "p3") in got and ("p0", "p2") in got


def test_cover_batch_kernel_bit_identical():
    """cover_bbox_batch_np must reproduce cover_bbox_np EXACTLY (same cells,
    same fully_inside, same order) for every box it claims to handle, across
    tiny/medium/high-latitude boxes and several resolutions."""
    from stac_to_geocore_spark.spatial.cover import cover_bbox_batch_np

    rng = np.random.default_rng(11)
    n = 600
    lon = rng.uniform(-179, 178, n)
    lat = rng.uniform(-85, 84, n)
    dx = 10 ** rng.uniform(-3, 0.7, n)
    dy = 10 ** rng.uniform(-3, 0.5, n)
    w, e = lon - dx, lon + dx
    s = np.maximum(lat - dy, -89.9)
    nn = np.minimum(lat + dy, 89.9)
    for res in (4, 6, 8):
        bi, cells, full, handled = cover_bbox_batch_np(w, s, e, nn, res)
        assert handled.sum() > n // 3  # the batch path takes a real share
        order = np.argsort(bi, kind="stable")
        bi_s, cells_s, full_s = bi[order], cells[order], full[order]
        bounds = np.searchsorted(bi_s, np.arange(n + 1))
        for i in range(n):
            if not handled[i]:
                continue
            c_ref, f_ref = cover_bbox_np(w[i], s[i], e[i], nn[i], res)
            lo, hi = bounds[i], bounds[i + 1]
            assert np.array_equal(c_ref, cells_s[lo:hi]), i
            assert np.array_equal(f_ref, full_s[lo:hi]), i


def _scatter_boxes(spark, n, hot_fraction=0.0):
    """> DRIVER_DIM_MAX synthetic boxes; hot_fraction of them stacked on one
    location (a 'dense city') so their covers pile onto the same few cells."""
    from pyspark.sql import functions as Fx

    # QUADRATIC scatter (m*m + c*m): a linear multiplicative scatter of
    # consecutive ids is a low-discrepancy lattice with NO close pairs —
    # the join would be vacuous (the round-4 fixture lesson)
    m1 = Fx.pmod(Fx.col("id") * 40503 + 17, Fx.lit(86000))
    m2 = Fx.pmod(Fx.col("id") * 9851 + 3, Fx.lit(40000))
    df = spark.range(n).select(
        Fx.concat(Fx.lit("b"), Fx.col("id").cast("string")).alias("poly_id"),
        (Fx.lit(-140.0) + Fx.pmod(m1 * m1 + 7 * m1, Fx.lit(86000)) / 1000.0).alias("lon"),
        (Fx.lit(42.0) + Fx.pmod(m2 * m2 + 13 * m2, Fx.lit(40000)) / 1000.0).alias("lat"),
        Fx.col("id"),
    )
    if hot_fraction:
        cut = int(n * hot_fraction)
        df = df.select(
            "poly_id",
            Fx.when(Fx.col("id") < cut, Fx.lit(-70.0) + Fx.col("id") / 1e7).otherwise(Fx.col("lon")).alias("lon"),
            Fx.when(Fx.col("id") < cut, Fx.lit(45.0) + Fx.col("id") / 1e7).otherwise(Fx.col("lat")).alias("lat"),
        )
    return df.select(
        "poly_id",
        (F.col("lon") - 0.03).alias("west"), (F.col("lat") - 0.02).alias("south"),
        (F.col("lon") + 0.03).alias("east"), (F.col("lat") + 0.02).alias("north"),
    )


def test_bbox_overlap_self_join_reuses_exchange(spark):
    """Both-big SELF-join with no hot cells: the grid cells must be computed
    and shuffled ONCE (ReusedExchange on the second SMJ input), with NO
    Python boundary and NO post-join dedup aggregate anywhere in the plan —
    the anchor-cell rule makes the join output distinct by construction."""
    from stac_to_geocore_spark.spatial.overlap import bbox_overlap_join

    polys = _scatter_boxes(spark, 11000)
    out = bbox_overlap_join(polys, polys).filter("id_a < id_b")
    out.collect()  # the df's OWN execution -> final adaptive plan below
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # drop the pre-AQE echo
    # zero Python nodes: the whole operator is JVM column math now
    for py_node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py_node not in final, final[:2000]
    assert "ReusedExchange" in final
    # no distinct(): pairs are exact-once via the anchor-cell predicate
    assert "HashAggregate" not in final and "SortAggregate" not in final, final[:2000]


def test_bbox_overlap_salted_hot_cells_same_result(spark):
    """A stacked 'city' of boxes must trigger hot-cell salting on the
    both-big path, and the salted join must return EXACTLY the plain rows."""
    from stac_to_geocore_spark.spatial.overlap import bbox_overlap_join

    polys = _scatter_boxes(spark, 10500, hot_fraction=0.02)
    # hot_fraction puts ~210 near-identical boxes on one spot: their covers
    # land on the same handful of cells, far above 8x the mean cell count
    salted = bbox_overlap_join(polys, polys, salt_hot_cells=True)
    plain = bbox_overlap_join(polys, polys, salt_hot_cells=False)
    s_plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" in s_plan  # the salted join shape was actually planned
    got_s = {(r.id_a, r.id_b) for r in salted.collect()}
    got_p = {(r.id_a, r.id_b) for r in plain.collect()}
    assert got_s == got_p and len(got_s) > 0


def test_bbox_overlap_non_self_paths_match_self_join(spark):
    """The both-big NON-self branches (symmetric tagged join, and salted)
    must return exactly what the self-join path returns on the same data —
    a second DataFrame over identical rows is NOT `is`-identical, so it
    exercises the code path real two-table joins take."""
    from stac_to_geocore_spark.spatial.overlap import bbox_overlap_join

    polys = _scatter_boxes(spark, 10500, hot_fraction=0.02)
    other = polys.select("*")  # same rows, different plan object
    assert other is not polys
    ref = {(r.id_a, r.id_b)
           for r in bbox_overlap_join(polys, polys, salt_hot_cells=False).collect()}
    sym = {(r.id_a, r.id_b)
           for r in bbox_overlap_join(polys, other, salt_hot_cells=False).collect()}
    salted = {(r.id_a, r.id_b)
              for r in bbox_overlap_join(polys, other, salt_hot_cells=True).collect()}
    assert sym == ref and salted == ref and len(ref) > 0


def test_bbox_overlap_salts_hot_cells_on_side_b_only(spark):
    """Round-5 blind spot, closed in round 6: the salt histogram samples
    BOTH sides of a two-table join, so a 'dense city' present ONLY on side
    B (sparse AOIs joined against a dense footprint table) must still take
    the salted plan — and must return exactly the unsalted join's rows."""
    from stac_to_geocore_spark.spatial.overlap import bbox_overlap_join

    polys_a = _scatter_boxes(spark, 10500)                       # uniform
    polys_b = _scatter_boxes(spark, 10500, hot_fraction=0.02)    # hot stack
    salted = bbox_overlap_join(polys_a, polys_b, salt_hot_cells=True)
    s_plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" in s_plan, "B-side-only hot cells must trigger salting"
    plain = bbox_overlap_join(polys_a, polys_b, salt_hot_cells=False)
    got_s = {(r.id_a, r.id_b) for r in salted.collect()}
    got_p = {(r.id_a, r.id_b) for r in plain.collect()}
    assert got_s == got_p and len(got_s) > 0


def _mixed_boxes(spark, n, dense=False):
    """Tiny boxes plus 0.5% AOI-scale (12-16 deg) boxes; dense=True packs
    the tiny boxes into a ~5x2.5 deg window (the coarse-cell quadratic
    regime the compact join exists for)."""
    from pyspark.sql import functions as Fx

    m1 = Fx.pmod(Fx.col("id") * 40503 + 17, Fx.lit(50000))
    m2 = Fx.pmod(Fx.col("id") * 9851 + 3, Fx.lit(25000))
    big = (Fx.col("id") % 200 == 0)
    dx = Fx.when(big, 6.0 + (Fx.col("id") % 3).cast("double")).otherwise(
        0.02 + (Fx.col("id") % 5).cast("double") * 0.01)
    dy = Fx.when(big, 5.0 + (Fx.col("id") % 2).cast("double")).otherwise(
        0.02 + (Fx.col("id") % 7).cast("double") * 0.005)
    denom = 10000.0 if dense else 1000.0
    return spark.range(n).select(
        Fx.concat(Fx.lit("b"), Fx.col("id").cast("string")).alias("poly_id"),
        (Fx.lit(-80.0) + Fx.pmod(m1 * m1 + 7 * m1, Fx.lit(50000)) / denom).alias("lon"),
        (Fx.lit(45.0) + Fx.pmod(m2 * m2 + 13 * m2, Fx.lit(25000)) / denom).alias("lat"),
        dx.alias("dx"), dy.alias("dy"),
    ).select(
        "poly_id",
        (F.col("lon") - F.col("dx")).alias("west"), (F.col("lat") - F.col("dy")).alias("south"),
        (F.col("lon") + F.col("dx")).alias("east"), (F.col("lat") + F.col("dy")).alias("north"),
    )


def test_bbox_overlap_compact_matches_single_res(spark):
    """The multi-res compact join must return EXACTLY the single-res join's
    pairs on a mixed-size (AOI + tiny) fixture — the single-res path is
    itself brute-force-anchored, so equality transitively anchors this one."""
    from stac_to_geocore_spark.spatial.overlap import (
        bbox_overlap_join,
        bbox_overlap_join_compact,
    )

    polys = _mixed_boxes(spark, 11000)
    ref = {(r.id_a, r.id_b)
           for r in bbox_overlap_join(polys, polys).filter("id_a < id_b").collect()}
    got = {(r.id_a, r.id_b)
           for r in bbox_overlap_join_compact(polys, polys).filter("id_a < id_b").collect()}
    assert got == ref and len(ref) > 100


def test_compact_expansion_native_condition_counts(spark):
    """Structural claims of the compact join's candidate generation on the
    dense regime: (a) the native-side join condition yields FEWER candidate
    pairs than the single-res join's shared-coarse-cell join; (b) dropping
    the native condition explodes candidates at the coarse levels (the
    quadratic the condition exists to kill)."""
    from stac_to_geocore_spark.spatial.cover import covers_df, covers_df_compact_expanded
    from stac_to_geocore_spark.spatial.overlap import (
        _res_for_mean_area,
        _res_stats_distributed,
    )

    polys = _mixed_boxes(spark, 6000, dense=True)
    r1, a1, _ = _res_stats_distributed(polys, 3, 9, 2048)
    res_single = max(3, min(r1, _res_for_mean_area(a1, 3, 9, 4.0)))
    cov = covers_df(polys, fixed_res=res_single).select("poly_id", "cell")
    cand_single = cov.alias("A").join(cov.alias("B"), "cell").count()

    r2, _a, med = _res_stats_distributed(polys, 3, 9, 262144, with_median=True)
    fine = max(3, min(r2, _res_for_mean_area(med, 3, 9, 4.0)))
    exp = covers_df_compact_expanded(
        polys, fine, list(range(max(0, fine - 3), fine + 1))
    ).select("poly_id", "lvl", "nat", "key")
    on_nat = ((F.col("A.lvl") == F.col("B.lvl")) & (F.col("A.key") == F.col("B.key"))
              & (F.col("A.nat") | F.col("B.nat")))
    on_all = (F.col("A.lvl") == F.col("B.lvl")) & (F.col("A.key") == F.col("B.key"))
    cand_nat = exp.alias("A").join(exp.alias("B"), on_nat).count()
    cand_all = exp.alias("A").join(exp.alias("B"), on_all).count()
    assert cand_nat < cand_single  # finer native cells beat forced-coarse
    assert cand_all > 3 * cand_nat  # the coarse-level quadratic is real

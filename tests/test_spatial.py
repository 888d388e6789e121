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

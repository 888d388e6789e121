"""Physical-plan contracts: the shapes that make the engine scale must not
regress (SURVEY.md §4). These assert on .explain output, not timings — the
properties that survive a 100x scale-up."""

from __future__ import annotations

import contextlib
import io

import pytest

from stac_to_geocore_spark.fixtures import images_df, polygons_df
from stac_to_geocore_spark.pipeline import flagship


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_plan_shape(spark):
    p = _plan(flagship(images_df(spark, 10_000, bytes_mode="none"), polygons_df(spark, 32)))
    # covers broadcast; the images side must never shuffle
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert p.count("Exchange") == p.count("BroadcastExchange"), "non-broadcast shuffle crept into the flagship"
    # refine predicate fused into the join (filter-refine, no second pass)
    assert "fully_inside" in p


def test_flagship_scan_pruned(spark, tmp_path):
    path = str(tmp_path / "imgs")
    images_df(spark, 5_000, bytes_mode="none").write.parquet(path)
    p = _plan(flagship(spark.read.parquet(path), polygons_df(spark, 8)))
    scan_lines = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scan_lines, p
    # bytes/caption/phash are not read — column pruning reaches the scan
    assert all("bytes" not in l and "caption" not in l for l in scan_lines), scan_lines


def test_pip_join_broadcasts_covers_not_points(spark):
    """The covers side must be the broadcast build side. Catalyst's size
    estimates were picking the exploded POINTS side at small sf (round-3
    find) — harmless locally, fatal at 10^12 points — so pip_join pins
    F.broadcast on driver-planned covers."""
    import pandas as pd
    import numpy as np

    from stac_to_geocore_spark.fixtures import POLYGONS_SCHEMA, gen_polygons_pdf, image_centroids
    from stac_to_geocore_spark.spatial.pip import pip_join

    lon, lat = image_centroids(np.arange(1000), seed=31)
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"p{i}" for i in range(1000)], "lon": lon, "lat": lat})
    )
    polys = spark.createDataFrame(gen_polygons_pdf(16, seed=5), POLYGONS_SCHEMA)
    p = _plan(pip_join(pts, polys))
    assert "BroadcastHashJoin" in p
    # build side = the LocalTableScan covers (BuildRight with points on the
    # left); the points side (ArrowEvalPython encode) must NOT sit under a
    # BroadcastExchange
    assert "BuildRight" in p and "BuildLeft" not in p, p.splitlines()[:20]


def test_q1_partial_aggregation(spark):
    import __spark_entry__ as m

    p = _plan(m.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert "partial" in p.lower(), "map-side combine missing from groupBy plan"
    assert [l for l in p.splitlines() if "PushedFilters" in l and "l_shipdate" in l] or \
           "l_shipdate" in p, "shipdate filter not near the scan"


def test_dim_joins_broadcast(spark):
    import __spark_entry__ as m

    p = _plan(m.queries()["q5_local_supplier"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p  # nation/region dims


def test_bbox_overlap_both_big_sort_merges_never_broadcasts(spark):
    """Both sides above driver_plan_max: the cover equi-join must be a
    SortMergeJoin on the cell key — a broadcast of a multi-million-row
    cover side OOMs real drivers (observed in a vanilla 1g session) and is
    never the 100 TB plan."""
    import numpy as np
    import pandas as pd

    from stac_to_geocore_spark.spatial.overlap import bbox_overlap_join

    rng = np.random.default_rng(23)
    n = 200
    w = rng.uniform(-120, -70, n)
    s = rng.uniform(45, 70, n)
    df = spark.createDataFrame(pd.DataFrame({
        "poly_id": [f"b{i}" for i in range(n)],
        "west": w, "south": s, "east": w + 0.5, "north": s + 0.4,
    }))
    p = _plan(bbox_overlap_join(df, df, driver_plan_max=50))
    assert "SortMergeJoin" in p, p.splitlines()[:25]
    assert "BroadcastHashJoin" not in p

"""Hypothesis property tests for the pure-numpy kernels (SURVEY.md §5.2):
cover superset, codec round-trips, tile monotonicity, S2 hierarchy."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from stac_to_geocore_spark.cells import h3x
from stac_to_geocore_spark.cells.s2 import s2_encode_np, s2_parent_np
from stac_to_geocore_spark.cells.tiles import tile_xy_np
from stac_to_geocore_spark.images.codecs import decode_image, encode_image, psnr
from stac_to_geocore_spark.spatial.cover import adaptive_res, cover_bbox_np

lat_st = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
lon_st = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False)


@settings(max_examples=30, deadline=None)
@given(lon=lon_st, lat=lat_st,
       w=st.floats(min_value=0.02, max_value=4.0), h=st.floats(min_value=0.02, max_value=4.0),
       seed=st.integers(min_value=0, max_value=2**31))
def test_cover_superset_property(lon, lat, w, h, seed):
    west, east = max(-179.5, lon - w / 2), min(179.5, lon + w / 2)
    south, north = max(-84.0, lat - h / 2), min(84.0, lat + h / 2)
    if east - west < 1e-6 or north - south < 1e-6:
        return
    res = adaptive_res(west, south, east, north)
    cells, _ = cover_bbox_np(west, south, east, north, res)
    rng = np.random.default_rng(seed)
    plon = rng.uniform(west, east, 300)
    plat = rng.uniform(south, north, 300)
    assert np.isin(h3x.h3_encode_np(plat, plon, res), cells).all()


@settings(max_examples=30, deadline=None)
@given(lat=lat_st, lon=lon_st, level=st.integers(min_value=1, max_value=30))
def test_s2_parent_contains_child(lat, lon, level):
    child = s2_encode_np(np.array([lat]), np.array([lon]), level)
    for up in range(level - 1, max(-1, level - 4), -1):
        assert s2_parent_np(child, up)[0] == s2_encode_np(np.array([lat]), np.array([lon]), up)[0]


@settings(max_examples=30, deadline=None)
@given(lat=lat_st, lon=lon_st, z=st.integers(min_value=0, max_value=18))
def test_tile_in_range_and_zoom_nesting(lat, lon, z):
    x, y = tile_xy_np(np.array([lon]), np.array([lat]), z)
    assert 0 <= x[0] < 2**z and 0 <= y[0] < 2**z
    if z > 0:
        px, py = tile_xy_np(np.array([lon]), np.array([lat]), z - 1)
        assert px[0] == x[0] // 2 and py[0] == y[0] // 2


@settings(max_examples=15, deadline=None)
@given(h=st.integers(min_value=1, max_value=80), w=st.integers(min_value=1, max_value=80),
       seed=st.integers(min_value=0, max_value=2**31), fmt=st.sampled_from(["ppm", "png"]))
def test_lossless_roundtrip_property(h, w, seed, fmt):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_image(px, fmt), fmt) == px).all()


@settings(max_examples=15, deadline=None)
@given(h=st.integers(min_value=4, max_value=64), w=st.integers(min_value=4, max_value=64),
       seed=st.integers(min_value=0, max_value=2**31))
def test_qjpg_psnr_property(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert psnr(px, decode_image(encode_image(px, "qjpg"), "qjpg")) >= 40.0


# --- relational operators vs brute force (random instances) ---

_ts0 = 1_600_000_000  # fixed epoch base; offsets in seconds


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 500_000)), min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 500_000)), min_size=1, max_size=25),
)
def test_asof_join_matches_brute_force(left_rows, right_rows):
    """Both as-of plans vs a brute-force per-row argmax over random keys
    and timestamps (including equal-ts ties and id tie-breaks)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stac_to_geocore_spark.relational import asof_join
    from stac_to_geocore_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    left = spark.createDataFrame(
        [(i, k, dt.datetime.utcfromtimestamp(_ts0 + off)) for i, (k, off) in enumerate(left_rows)],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(i, k, dt.datetime.utcfromtimestamp(_ts0 + off)) for i, (k, off) in enumerate(right_rows)],
        "rid long, k long, rts timestamp",
    )
    want = {}
    for i, (lk, loff) in enumerate(left_rows):
        best = None
        for j, (rk, roff) in enumerate(right_rows):
            if rk == lk and roff <= loff:
                cand = (roff, j)
                best = cand if best is None or cand > best else best
        if best is not None:
            want[i] = best[1]
    for bc in (True, False):
        got = {
            r["lid"]: r["asof_rid"]
            for r in asof_join(
                left, right, "k", "k", F.col("lts"), F.col("rts"), "rid", broadcast_right=bc
            ).collect()
        }
        assert got == want, f"broadcast={bc}"


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 900_000), min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 900_000), st.integers(0, 400_000)), min_size=1, max_size=20),
    st.sampled_from([3600, 86_400, 50_000]),
)
def test_range_join_matches_brute_force(fact_offs, iv_rows, bucket):
    """Bucketed range join vs brute force for arbitrary bucket sizes,
    interval lengths (incl. zero-length), and boundary landings."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stac_to_geocore_spark.relational import range_join
    from stac_to_geocore_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    facts = spark.createDataFrame(
        [(i, dt.datetime.utcfromtimestamp(_ts0 + off)) for i, off in enumerate(fact_offs)],
        "fid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(i, dt.datetime.utcfromtimestamp(_ts0 + lo), dt.datetime.utcfromtimestamp(_ts0 + lo + ln))
         for i, (lo, ln) in enumerate(iv_rows)],
        "ivid long, lo timestamp, hi timestamp",
    )
    got = {
        (r["fid"], r["ivid"])
        for r in range_join(facts, iv, F.col("ts"), F.col("lo"), F.col("hi"), bucket_seconds=bucket).collect()
    }
    want = {
        (i, j)
        for i, off in enumerate(fact_offs)
        for j, (lo, ln) in enumerate(iv_rows)
        if lo <= off <= lo + ln
    }
    assert got == want

"""Round-4 hardening: tests for the round-3 ADVICE fixes.

- snapshots.vacuum() reclaims commit tmp files from dead pids, never from
  live ones
- pip_ring_join rejects duplicate poly_id rows (refine groups by poly_id)
- minhash pair output is identical with and without the opt-in signature
  persist
- the UDF session-cache key is stable per context and not an id() value
"""

from __future__ import annotations

import os

import pytest


def test_vacuum_sweeps_dead_pid_tmp_keeps_live(tmp_path, spark):
    from stac_to_geocore_spark.tables.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "snap"))
    t.append(spark.range(3))
    # a tmp from a pid that cannot exist (pid_max is < 2^22 on linux)
    dead = os.path.join(t.meta_dir, "v9.json.tmp.4999999")
    open(dead, "w").write("{}")
    live = os.path.join(t.meta_dir, f"v8.json.tmp.{os.getpid()}")
    open(live, "w").write("{}")
    removed = t.vacuum()
    assert dead in removed and not os.path.exists(dead)
    assert os.path.exists(live)  # in-flight writer (this pid) untouched
    os.unlink(live)


def test_pip_ring_join_rejects_duplicate_poly_ids(spark):
    from stac_to_geocore_spark.spatial.pip import pip_ring_join

    rings = spark.createDataFrame(
        [
            ("p0", [-100.0, -99.0, -99.5], [50.0, 50.0, 51.0]),
            ("p0", [-90.0, -89.0, -89.5], [50.0, 50.0, 51.0]),
        ],
        "poly_id string, ring_lon array<double>, ring_lat array<double>",
    )
    pts = spark.createDataFrame([(1, -99.5, 50.3)], "point_id long, lon double, lat double")
    with pytest.raises(ValueError, match="one ring per poly_id"):
        pip_ring_join(pts, rings)


def test_minhash_pairs_identical_with_and_without_persist(spark):
    from pyspark.sql import functions as F

    from stac_to_geocore_spark.text.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [(i, base + f" tail{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.id_a, r.id_b, r.est_jaccard)
         for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    b = {(r.id_a, r.id_b, r.est_jaccard)
         for r in minhash_lsh_pairs(docs, threshold=0.5, persist_signatures=True).collect()}
    assert a == b and len(a) > 0


def test_session_cache_key_is_stable_and_not_an_object_id(spark):
    from stac_to_geocore_spark.cells.h3x import _session_cache_key

    k1 = _session_cache_key()
    k2 = _session_cache_key()
    assert k1 == k2
    app_id, start = k1
    assert isinstance(app_id, str) and app_id  # applicationId, not id()
    assert isinstance(start, int)


def test_vectorized_res_stats_match_scalar_adaptive_res(spark):
    import numpy as np
    import pandas as pd

    from stac_to_geocore_spark.spatial.overlap import (
        _min_res_pdf,
        _res_stats_distributed,
    )

    rng = np.random.default_rng(17)
    n = 300
    w = rng.uniform(-130, -60, n)
    s = rng.uniform(42, 78, n)
    # mix of tiny, medium and huge boxes so several res levels are exercised
    dw = rng.choice([0.01, 0.3, 5.0, 25.0], n) * rng.uniform(0.5, 1.5, n)
    dh = rng.choice([0.01, 0.3, 5.0, 20.0], n) * rng.uniform(0.5, 1.5, n)
    pdf = pd.DataFrame({
        "poly_id": [f"p{i}" for i in range(n)],
        "west": w, "south": s, "east": w + dw, "north": s + dh,
    })
    df = spark.createDataFrame(pdf)
    got_res, got_area, got_med = _res_stats_distributed(df, 3, 9, 2048, with_median=True)
    assert got_res == _min_res_pdf(pdf, 3, 9, 2048)
    want_area = float(np.mean(
        np.radians(pdf["east"] - pdf["west"]) * np.radians(pdf["north"] - pdf["south"])
        * np.cos(np.radians((pdf["south"] + pdf["north"]) / 2.0))
    ))
    # partitioned float sum order differs from numpy's — compare loosely
    assert abs(got_area - want_area) < 1e-9 * max(1.0, abs(want_area))
    # the approx median (compact join's res knob) must sit within the
    # exact median's neighbor ranks — percentile_approx with accuracy 1e4
    # is exact at n=300, so compare tightly
    want_med = float(np.median(
        np.radians(pdf["east"] - pdf["west"]) * np.radians(pdf["north"] - pdf["south"])
        * np.cos(np.radians((pdf["south"] + pdf["north"]) / 2.0))
    ))
    lo = np.sort(np.radians(pdf["east"] - pdf["west"]) * np.radians(pdf["north"] - pdf["south"])
                 * np.cos(np.radians((pdf["south"] + pdf["north"]) / 2.0)))
    assert lo[len(lo) // 2 - 2] <= got_med <= lo[len(lo) // 2 + 2]
    assert abs(got_med - want_med) < 0.5 * want_med

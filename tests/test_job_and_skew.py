"""End-to-end harvest job parity + targeted skew salting."""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F

REF_DIR = "/root/reference/stac-to-geocore"
if REF_DIR not in sys.path:
    sys.path.insert(0, REF_DIR)

from stac_to_geocore_spark.fixtures import (
    API_ROOT,
    POLYGONS_SCHEMA,
    gen_polygons_pdf,
    image_centroids,
    images_df,
    make_fake_stac_fetch,
)
from stac_to_geocore_spark.job import run_harvest
from stac_to_geocore_spark.sources.sinks import LocalObjectStore
from stac_to_geocore_spark.spatial.cover import covers_pdf
from stac_to_geocore_spark.spatial.skew import plan_salts, salted_cell_join


def test_run_harvest_end_to_end(spark, tmp_path):
    fetch = make_fake_stac_fetch(n_items=60)
    store_root = str(tmp_path / "harvest_out")
    keys = run_harvest(spark, API_ROOT, store_root, fetch)
    # 1 root + 8 collections + 60 items
    assert len(keys) == 69
    store = LocalObjectStore(store_root)
    listed = store.list()
    assert "lastRun.txt" in listed and len(listed) == 70
    root_doc = json.loads(store.get("ccmeo-root-CCMEO-Datacube.geojson"))
    assert root_doc["type"] == "FeatureCollection"
    assert root_doc["features"][0]["properties"]["title"]["en"] == " Root  - CCMEO Datacube"
    # atomic variant produces the identical key set
    keys2 = run_harvest(spark, API_ROOT, str(tmp_path / "atomic_out"), fetch, atomic=True)
    assert sorted(keys) == sorted(keys2)


def test_run_harvest_matches_reference_bytes(spark, tmp_path):
    """Spot-check: a sink object is byte-identical to the reference flow."""
    import stac_to_geocore as ref
    from stac_to_geocore_spark.compat.template import null_template
    from stac_to_geocore_spark.fixtures import stac_collections_fixture, stac_items_fixture, stac_root_fixture

    fetch = make_fake_stac_fetch(n_items=16)
    store_root = str(tmp_path / "roundtrip")
    run_harvest(spark, API_ROOT, store_root, fetch)
    store = LocalObjectStore(store_root)

    root = stac_root_fixture()
    colls = stac_collections_fixture()
    items = stac_items_fixture(16)
    params = {
        "root_name": "CCMEO Datacube/ CCCOT Cube de données",
        "root_links": root["links"], "root_id": "CCMEO-Datacube",
        "root_des": root["description"], "root_bbox": None, "source": "ccmeo",
        "status": ref.status, "maintenance": ref.maintenance,
        "useLimits_en": ref.useLimits_en, "useLimits_fr": ref.useLimits_fr,
        "spatialRepresentation": ref.spatialRepresentation, "contact": ref.contact,
        "type_data": ref.type_data, "topicCategory": ref.topicCategory,
        "sourceSystemName": "ccmeo-datacube",
    }
    cid = {
        c["id"]: {"title": {"en": f[6], "fr": f[7]}, "description": {"en": f[8], "fr": f[9]},
                  "keywords": {"en": f[10], "fr": f[11]}}
        for c in colls for f in [ref.get_collection_fields(c)]
    }
    item = items[3]
    t = null_template()
    g = ref.to_features_geometry(t, bbox=item["bbox"])
    p = ref.item_to_features_properties(params, t, item, cid)
    expected = json.dumps(ref.update_geocore_dict(t, p, g), indent=4, ensure_ascii=False)
    got = store.get(f"ccmeo-{item['collection']}-{item['id']}.geojson")
    assert got == expected


def test_plan_salts_finds_hot_cells(spark):
    import numpy as np

    from stac_to_geocore_spark.cells.h3x import h3_encode

    imgs = images_df(spark, 30_000, bytes_mode="none")  # 80% in 12 clusters
    pts = imgs.withColumn("cell", h3_encode(F.col("lat"), F.col("lon"), 5))
    salts = plan_salts(pts, sample_fraction=0.2)
    assert salts, "clustered fixture must produce hot cells"
    assert all(2 <= v <= 32 for v in salts.values())


def test_salted_cell_join_matches_plain(spark):
    from stac_to_geocore_spark.cells.h3x import h3_encode

    imgs = images_df(spark, 20_000, bytes_mode="none")
    pts = imgs.withColumn("cell", h3_encode(F.col("lat"), F.col("lon"), 5)).select("image_id", "lon", "lat", "cell")
    covers = spark.createDataFrame(
        covers_pdf(gen_polygons_pdf(24), fixed_res=5),
        "poly_id string, res int, cell long, fully_inside boolean, west double, south double, east double, north double",
    )
    salts = plan_salts(pts, sample_fraction=0.5)
    plain = {(r.image_id, r.poly_id) for r in pts.join(covers, "cell").select("image_id", "poly_id").collect()}
    salted = {
        (r.image_id, r.poly_id)
        for r in salted_cell_join(pts, covers, salts).select("image_id", "poly_id").collect()
    }
    assert plain == salted


def test_salting_balances_hot_cell_across_subkeys(spark):
    """The point of salting is load balance: a hot cell's rows must spread
    ~evenly across its salt_factor sub-keys (the join reducers), not just
    produce the same result. Structural check — no timing, host-independent."""
    import pandas as pd
    from pyspark.sql import functions as F

    # one pathological cell holding 90% of the rows (coastal-city skew)
    n_hot, n_cold = 9000, 1000
    pdf = pd.DataFrame({
        "image_id": [f"p{i:05d}" for i in range(n_hot + n_cold)],
        "cell": [7777] * n_hot + [100 + i % 50 for i in range(n_cold)],
    })
    pts = spark.createDataFrame(pdf)
    salts = plan_salts(pts, sample_fraction=1.0)
    assert 7777 in salts and salts[7777] >= 2, salts
    factor = salts[7777]

    covers = spark.createDataFrame(
        pd.DataFrame({"cell": [7777] + [100 + i for i in range(50)],
                      "poly_id": ["hot"] + [f"c{i}" for i in range(50)]})
    )
    joined = salted_cell_join(pts, covers, salts)
    shares = (
        joined.filter(F.col("cell") == 7777)
        .groupBy("salt").count().toPandas().set_index("salt")["count"]
    )
    assert len(shares) == factor, f"hot cell used {len(shares)} of {factor} salts"
    # deterministic-hash split: every sub-key within 30% of the even share
    even = n_hot / factor
    assert shares.max() <= 1.3 * even and shares.min() >= 0.7 * even, shares.to_dict()

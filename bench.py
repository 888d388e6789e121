"""Per-round bench harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "images_per_sec": ...}

The flagship stage (H3 encode + PIP join + tile assignment — BASELINE.json's
metric) runs over a synthetic images table sized ~10x lineitem's row count
for the chosen sf, generated distributed (counter-based, no driver
materialization) with bytes_mode='none' so we measure the engine, not the
fixture generator. Full execution is forced with the noop sink (whole plan
runs, nothing collected).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from stac_to_geocore_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]",
        shuffle_partitions=max(16, 2 * int(cpus)),
        extra_conf={
            # flagship rows are narrow (no binary payload): large Arrow
            # batches amortize per-batch python overhead; fat-row jobs keep
            # the 1024 default from session.py
            "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from bench_scaling import ensure_images_table
    from stac_to_geocore_spark.fixtures import polygons_df
    from stac_to_geocore_spark.pipeline import flagship

    timings: dict[str, float] = {}

    # --- flagship: H3 encode + PIP join + tile assign (images/sec metric)
    # over a pre-materialized parquet images table (the metric is the
    # pipeline, not fixture generation) ---
    try:
        n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "0")) or {
            "0.001": 20_000, "0.01": 200_000, "0.1": 2_000_000,
        }.get(sf, 2_000_000)
    except ValueError:
        n_images = 2_000_000
    images = spark.read.parquet(ensure_images_table(spark, n_images))
    polys = polygons_df(spark, 64)
    _force(flagship(images.limit(20_000), polys))  # warmup
    t0 = time.monotonic()
    _force(flagship(images, polys))
    flagship_sec = time.monotonic() - t0
    timings["flagship_pipeline"] = round(flagship_sec, 3)
    images_per_sec = round(n_images / flagship_sec, 1)

    # per-stage decomposition of the same input (BASELINE.md stage table)
    from pyspark.sql import functions as Fn

    from stac_to_geocore_spark.cells.tiles import tile_x_expr, tile_y_expr
    from stac_to_geocore_spark.pipeline import encode_stage

    t0 = time.monotonic()
    _force(encode_stage(images))
    timings["stage_encode_h3_s2_tile"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    _force(images.select("image_id", tile_x_expr(Fn.col("lon"), 12).alias("x"),
                         tile_y_expr(Fn.col("lat"), 12).alias("y")))
    timings["stage_tile_only"] = round(time.monotonic() - t0, 3)

    # --- headline relational / text / spatial queries on the sf tables ---
    bench_queries = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "top_customers_window", "events_hourly", "events_sessions",
        "tile_assign", "pip_assign", "knn_ring",
        # the 100x-scale code paths, not just the dim/broadcast routes
        # (round-3 VERDICT #6): salted-shuffle PIP and distributed-covers
        # region join — a regression in either now moves a committed number
        "pip_salted", "bbox_overlap_distributed",
        "dedup_exact", "doc_stats", "stopword_score", "ann_topk",
    ]
    qmap = entrymod.all_queries()  # bench suite spans gate + demoted entries
    for name in bench_queries:
        if name not in qmap:
            continue
        t0 = time.monotonic()
        try:
            _force(qmap[name](spark, sf_dir))
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # keep the bench line intact
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(json.dumps({
        "metric": "headline suite wall time (flagship H3+PIP+tile pipeline + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "images_per_sec": images_per_sec,
        "n_images": n_images,
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

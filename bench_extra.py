"""Round-6 phase-isolation microbench (guide §1.4: noop sink) — NOT the
driver bench (bench.py is frozen). Reproduces the measurements that drove
the round-6 optimizations, each phase forced with the noop sink so the
computation is timed, not the sink:

  * bbox_overlap_distributed phase split: stats agg / salt histogram /
    grid-cell explode / join-only (the old hex path's equivalents were
    0.78 s pandas-UDF stats, 1.63 s histogram, 4.29 s MapInPandas covers,
    ~14.5 s join+distinct at sf1.0 — see OPTIMIZATION_r06.md).
  * pip prefilter clause-cost scaling on derived columns (per-box OR vs
    merged envelopes vs single envelope).
  * single-row-group scan starvation: the same Python-heavy stage with and
    without partitioning.fan_out.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from stac_to_geocore_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=max(16, 2 * int(cpus)),
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import _fixture_polygons_pdf, _orders_bbox_polys, _points_df
    from stac_to_geocore_spark.partitioning import fan_out
    from stac_to_geocore_spark.spatial.overlap import (
        _grid_side_stats,
        _grid_steps,
        bbox_overlap_join,
    )
    from stac_to_geocore_spark.spatial.skew import plan_salts

    out: dict[str, float] = {}
    sc = spark.sparkContext

    # ---- bbox_overlap_distributed phase split -------------------------
    polys = _orders_bbox_polys(spark, sf_dir)
    _force(polys.limit(1000))  # warmup
    sc.setJobDescription("bbox: stats agg")
    stats = None

    def _stats():
        nonlocal stats
        stats = _grid_side_stats(polys)

    out["bbox_stats_agg"] = _best(_stats)
    n, mw, xw, mh, xh = stats
    dx, dy = _grid_steps(mw, xw, mh, xh, 2048, None, 0.5)

    def cells(df):
        # mirrors bbox_overlap_join's internal grid-cell construction
        # (overlap.py) so the explode phase can be timed in isolation; if
        # the operator's cell generation changes, update this copy too
        return (
            df.select(
                "poly_id", "west", "south", "east", "north",
                F.explode(F.sequence(F.floor(F.col("west") / F.lit(dx)),
                                     F.floor(F.col("east") / F.lit(dx)))).alias("gx"),
            ).select(
                "poly_id", "west", "south", "east", "north", "gx",
                F.explode(F.sequence(F.floor(F.col("south") / F.lit(dy)),
                                     F.floor(F.col("north") / F.lit(dy)))).alias("gy"),
            )
        )

    sc.setJobDescription("bbox: salt histogram")
    out["bbox_salt_histogram"] = _best(lambda: plan_salts(
        cells(polys.sample(fraction=0.05, seed=42))
        .select(F.xxhash64("gx", "gy").alias("cell")),
        sample_fraction=1.0, hot_multiplier=8.0))
    sc.setJobDescription("bbox: grid-cell explode only")
    out["bbox_cells_explode"] = _best(lambda: _force(cells(polys)))
    sc.setJobDescription("bbox: join only (no salt planning)")
    out["bbox_join_no_salt"] = _best(lambda: _force(
        bbox_overlap_join(polys, polys, salt_hot_cells=False)
        .filter(F.col("id_a") < F.col("id_b"))))
    sc.setJobDescription("bbox: full declared query")
    out["bbox_full_query"] = _best(lambda: _force(
        bbox_overlap_join(polys, polys).filter(F.col("id_a") < F.col("id_b"))))

    # ---- pip prefilter clause-cost on derived columns -----------------
    pts = _points_df(spark, sf_dir)
    _force(pts)
    pdf = _fixture_polygons_pdf()
    boxes = pdf[["west", "south", "east", "north"]].to_numpy()

    def clause(w, s, e, nn):
        return (f"(`lon` >= {float(w)!r} AND `lon` <= {float(e)!r}"
                f" AND `lat` >= {float(s)!r} AND `lat` <= {float(nn)!r})")

    per_box = " OR ".join(clause(*b) for b in boxes)
    from stac_to_geocore_spark.spatial.cover import merge_envelopes

    envs4 = merge_envelopes(boxes, max_k=4)
    env4 = " OR ".join(clause(w, s, e, nn) for w, s, e, nn in envs4)
    env1 = clause(boxes[:, 0].min(), boxes[:, 1].min(),
                  boxes[:, 2].max(), boxes[:, 3].max())
    sc.setJobDescription("pip prefilter: 24-box OR")
    out["prefilter_24_boxes"] = _best(lambda: _force(pts.filter(F.expr(per_box))))
    sc.setJobDescription("pip prefilter: 4 merged envelopes")
    out["prefilter_4_envelopes"] = _best(lambda: _force(pts.filter(F.expr(env4))))
    sc.setJobDescription("pip prefilter: single envelope")
    out["prefilter_1_envelope"] = _best(lambda: _force(pts.filter(F.expr(env1))))

    # ---- single-row-group starvation: BPE with and without fan_out ----
    from stac_to_geocore_spark.text.bpe import bpe_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sc.setJobDescription("bpe: single-split (no fan_out)")
    out["bpe_no_fan_out"] = _best(lambda: _force(
        docs.select("doc_id", bpe_token_count(F.col("text")).alias("n"))))
    sc.setJobDescription("bpe: fan_out")
    out["bpe_fan_out"] = _best(lambda: _force(
        fan_out(docs).select("doc_id", bpe_token_count(F.col("text")).alias("n"))))
    sc.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()

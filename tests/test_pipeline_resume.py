"""Kill-resume of the full north-star pipeline (flagship + lineage):
the materialized assignments table after a crash + resume must equal a
clean one-shot run, without rewriting committed partitions."""

from __future__ import annotations

import pytest

from stac_to_geocore_spark.fixtures import images_df, polygons_df
from stac_to_geocore_spark.pipeline import materialize_assignments
from stac_to_geocore_spark.tables.lineage import LineageWriter, read_manifest


def test_flagship_kill_resume(spark, tmp_path):
    imgs = images_df(spark, 4000, bytes_mode="none")
    polys = polygons_df(spark, 24)
    crash_path = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        # simulate a kill after 2 committed batches of 3 partitions
        from stac_to_geocore_spark.pipeline import flagship
        from pyspark.sql import functions as F

        out = flagship(imgs, polys).withColumn("cell", F.col("h3_r7"))
        LineageWriter(crash_path, partition_col="cell_p5").write(
            out, run_id="r1", batch_size=3, fail_after_batches=2
        )
    committed = {m["partition"] for m in read_manifest(crash_path)}
    assert committed

    resumed_rows = materialize_assignments(imgs, polys, crash_path, run_id="r2", batch_size=3)
    assert {m["partition"] for m in resumed_rows}.isdisjoint(committed)
    # per-partition throughput metrics present (north_rule)
    assert all("rows_per_sec" in m and m["row_count"] > 0 for m in resumed_rows)

    clean_path = str(tmp_path / "clean")
    materialize_assignments(imgs, polys, clean_path, run_id="clean")
    a = LineageWriter(crash_path).read(spark).orderBy("image_id", "poly_id").toPandas()
    b = LineageWriter(clean_path).read(spark).orderBy("image_id", "poly_id").toPandas()
    cols = [c for c in a.columns if c != "cell_p5"]
    assert a[cols].equals(b[cols])

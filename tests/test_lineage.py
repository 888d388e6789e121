"""Per-partition lineage: manifest contents, kill-resume without recompute
(SURVEY.md §5.2 item 6; BASELINE.json north_rule)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stac_to_geocore_spark.fixtures import images_df
from stac_to_geocore_spark.pipeline import encode_stage
from stac_to_geocore_spark.tables.lineage import LineageWriter, read_manifest


@pytest.fixture()
def encoded(spark):
    return encode_stage(images_df(spark, 3000, bytes_mode="none"))


def test_write_commits_all_partitions(spark, tmp_path, encoded):
    w = LineageWriter(str(tmp_path / "t1"))
    rows = w.write(encoded, run_id="r1")
    manifest = read_manifest(w.path)
    assert len(manifest) == len(rows) > 0
    assert all(m["status"] == "committed" for m in manifest)
    assert all(m["row_count"] > 0 for m in manifest)
    assert all(m["cell_range"][0] <= m["cell_range"][1] for m in manifest)
    got = w.read(spark)
    assert got.count() == 3000


def test_kill_resume_without_recompute(spark, tmp_path, encoded):
    path = str(tmp_path / "t2")
    w = LineageWriter(path)
    with pytest.raises(RuntimeError, match="injected failure"):
        w.write(encoded, run_id="r1", batch_size=3, fail_after_batches=2)
    first = read_manifest(path)
    committed_first = {m["partition"] for m in first}
    assert 0 < len(committed_first) < encoded.select("cell_p5").distinct().count()
    # record mtimes of committed partition dirs — resume must not rewrite them
    mtimes = {
        p: os.path.getmtime(os.path.join(w.data_dir, f"cell_p5={p}"))
        for p in committed_first
    }
    rows2 = w.write(encoded, run_id="r2", batch_size=3)
    assert {m["partition"] for m in rows2}.isdisjoint(committed_first)
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(w.data_dir, f"cell_p5={p}")) == t
    # complete + identical to a clean one-shot write
    clean = LineageWriter(str(tmp_path / "t3"))
    clean.write(encoded, run_id="clean")
    a = w.read(spark).orderBy("image_id").toPandas()
    b = clean.read(spark).orderBy("image_id").toPandas()
    assert a.drop(columns=["cell_p5"]).equals(b.drop(columns=["cell_p5"]))


def test_checksums_match_recompute(spark, tmp_path, encoded):
    w = LineageWriter(str(tmp_path / "t4"))
    w.write(encoded, run_id="r1")
    manifest = {m["partition"]: m for m in read_manifest(w.path)}
    back = w.read(spark)
    cols = [c for c in encoded.columns]
    stats = (
        back.groupBy(F.col("cell_p5").cast("string").alias("p"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(" + ", ".join(cols) + "))").alias("chk"),
        )
        .collect()
    )
    for s in stats:
        assert manifest[s["p"]]["row_count"] == s["n"]
        assert manifest[s["p"]]["checksum"] == int(s["chk"])


def test_idempotent_rerun_is_noop(spark, tmp_path, encoded):
    w = LineageWriter(str(tmp_path / "t5"))
    w.write(encoded, run_id="r1")
    assert w.write(encoded, run_id="r2") == []

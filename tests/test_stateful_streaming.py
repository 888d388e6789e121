"""applyInPandasWithState: duplicates injected across micro-batches must be
dropped; every distinct event survives exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_to_geocore_spark.streaming.events import stream_events_from_dir
from stac_to_geocore_spark.streaming.stateful import dedup_stream

SF = "/root/testdata/sf0.001"


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet").limit(600)
    d = tmp_path / "drops"
    d.mkdir()
    # drop 1: first 400 events; drop 2: events 200-600 (200-400 duplicated)
    ev = events.orderBy("event_id")
    ev.filter(F.col("event_id") < 400).coalesce(1).write.parquet(str(d / "a"))
    ev.filter((F.col("event_id") >= 200)).coalesce(1).write.parquet(str(d / "b"))
    import glob, shutil, os
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "*.parquet")))):
        shutil.copy(f, str(flat / f"drop{i}.parquet"))

    stream = stream_events_from_dir(spark, str(flat))
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from dedup_out").toPandas()
    want_ids = set(r.event_id for r in events.collect())
    assert len(got) == len(want_ids), f"{len(got)} emitted vs {len(want_ids)} distinct"
    assert set(got.event_id) == want_ids
    assert got.event_id.is_unique

"""Structured Streaming surface: windowed counts and session windows over a
file-source event stream must converge to the batch answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stac_to_geocore_spark.streaming.events import (
    sessionize_stream,
    stream_events_from_dir,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    # split events into 3 parquet drops = 3 micro-batches
    d = tmp_path_factory.mktemp("events_stream")
    events = spark.read.parquet(f"{SF}/events.parquet")
    # time-ordered drops: micro-batches must advance event time or the
    # watermark (correctly) drops the stragglers
    ev = events.withColumn("_e", F.unix_timestamp("ts").cast("double"))
    q1, q2 = ev.approxQuantile("_e", [0.33, 0.66], 0.0)
    ev.filter(F.col("_e") <= q1).drop("_e").coalesce(1).write.parquet(str(d / "p0"))
    ev.filter((F.col("_e") > q1) & (F.col("_e") <= q2)).drop("_e").coalesce(1).write.parquet(str(d / "p1"))
    ev.filter(F.col("_e") > q2).drop("_e").coalesce(1).write.parquet(str(d / "p2"))
    import glob, shutil, os
    flat = tmp_path_factory.mktemp("events_flat")
    for i, f in enumerate(sorted(glob.glob(str(d / "p*" / "*.parquet")))):
        shutil.copy(f, os.path.join(str(flat), f"drop{i}.parquet"))
    return str(flat)


def _run_to_completion(q_df, tmp_path, name):
    query = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
        .start()
    )
    query.processAllAvailable()
    query.stop()


def test_windowed_counts_match_batch(spark, stream_dir, tmp_path):
    stream = stream_events_from_dir(spark, stream_dir)
    assert stream.isStreaming
    _run_to_completion(windowed_event_counts(stream), tmp_path, "win_counts")
    got = spark.sql("select * from win_counts").toPandas()
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("total_value"))
        .toPandas()
    )
    key = ["window_start", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g.n.to_numpy() == b.n.to_numpy()).all()


def test_session_windows_produce_sessions(spark, stream_dir, tmp_path):
    stream = stream_events_from_dir(spark, stream_dir)
    _run_to_completion(sessionize_stream(stream), tmp_path, "sessions")
    got = spark.sql("select * from sessions").toPandas()
    assert len(got) > 0
    assert (got.n_events >= 1).all()
    # session totals must cover every event exactly once
    assert got.n_events.sum() == spark.read.parquet(f"{SF}/events.parquet").count()
